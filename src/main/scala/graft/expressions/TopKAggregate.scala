package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k: per group, keep the k (score, id) pairs with
  * the highest score (ties by smallest id), returned as a sorted
  * array<struct<score,id>>.
  *
  * The scale story vs `row_number() OVER (PARTITION BY g ORDER BY s)`:
  * the window sorts EVERY group's full row set after the shuffle; this
  * aggregate keeps an O(k) heap per group and — being a proper aggregate —
  * runs map-side partial aggregation, so only k rows per group per
  * partition cross the shuffle. For top-3-of-millions-per-group the
  * shuffle shrinks by orders of magnitude.
  *
  * Null handling: rows with a null score or id are skipped (standard
  * aggregate semantics) — a window row_number would rank null scores last
  * instead, so the two forms differ only when a group has fewer than k
  * non-null rows. NaN scores sort greatest, matching SQL DESC order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs and k > 0, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}), k=$k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** Bounded min-heap of (score, id): evicts the WORST element (lowest score,
  * then largest id) once size exceeds k. "Better" = higher score, tie →
  * smaller id.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary min-heap keyed by (score asc, id desc)
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  // heap-order predicate: a is "worse" than b → a nearer the root.
  // Double.compare gives Spark's SQL total order for doubles (NaN sorts
  // greatest), so NaN scores rank like the row_number window form instead
  // of jamming the heap root and blocking eviction.
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def add(s: Double, i: Long): Unit = {
    if (n < k) {
      if (n == scores.length) {
        scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
        ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
      }
      scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i; siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** best-first: score desc (NaN greatest, like SQL DESC), tie id asc */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = java.lang.Double.compare(sa, sb)
      c > 0 || (c == 0 && ia < ib)
    }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < m) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

object TopKAggregate {
  /** Column surface: `topKByScore(score, id, k)` inside a groupBy().agg. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
