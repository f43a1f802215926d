package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-only signature kernels for the near-dup family.
  *
  * The aggregate forms (groupBy(doc).agg(32 × min(xxhash64(sh, i))) for
  * MinHash, 64 conditional ±1 sums for SimHash) shuffle the ENTIRE
  * exploded shingle/token set just to reduce it back to one row per doc —
  * at corpus scale that is the single largest shuffle in the dedup
  * pipeline, moving |corpus| × shingles-per-doc rows. Each kernel here
  * computes the same signature from the per-row shingle/token ARRAY in one
  * codegen pass: no explode, no shuffle, the signature stage becomes pure
  * map work. The exploded form is still built downstream, but only for
  * CANDIDATE docs (jaccard verification), which LSH has already pruned.
  *
  * Bit-compatibility: hashes replicate Spark's `xxhash64(...)` chains via
  * the same XXH64 primitives (seed 42, left-to-right chaining), so
  * signatures are identical to the aggregate forms — asserted in
  * DedupSpec against the retained aggregate oracles.
  */
// deliberately NOT CostlyTextKernel: these kernels were never part of the
// width guards' costly-work dispatch, so marking them would flip widenPlan
// decisions (which segments widen) that rounds 14-16 settled by
// measurement. The marker belongs only on kernels that REPLACED
// already-detected forms (TextScanExpressions), where it preserves the
// existing dispatch instead of changing it.
abstract class StringArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
}

/** array<long> of `numHashes` MinHash components: component j is
  * min over the (deduplicated upstream) shingles s of the chained
  * xxhash64(s, j). Null when the array has NO usable element (empty or
  * all-null — such docs can't be candidates; mirrors the aggregate form,
  * where they had no rows). Null ELEMENTS are skipped, which diverges
  * from the aggregate oracle (xxhash64 skips null children, contributing
  * hashInt(j, 42)) — our shingle/token producers never emit null
  * elements, and skipping beats emitting a degenerate constant component.
  */
case class MinhashSignatures(child: Expression, numHashes: Int)
    extends StringArrayExpression {
  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var found = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        found = true
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashInt(j, h1)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    // no usable shingles (empty OR all-null array) → null, same as a doc
    // with no rows in the aggregate form. Emitting the Long.MaxValue fill
    // here would give every such row one degenerate signature and collapse
    // the candidate join toward all-pairs for that stratum.
    if (!found) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val found = ctx.freshName("found")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $found = true;
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h1 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $h = $xxh.hashInt($j, $h1);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |if (!$found) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over the token array (multiplicity counts): token hash
  * bit b votes ±1; signature bit b is 1 where the vote sum is positive.
  * Null for an empty token array.
  */
case class SimhashSignature(child: Expression) extends StringArrayExpression {
  override def prettyName: String = "simhash_sig"
  override def dataType: DataType = LongType

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var found = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        found = true
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    // no usable tokens (empty or all-null array) → null, not the constant
    // all-zero signature that would hamming-collide all such docs
    if (!found) return null
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val found = ctx.freshName("found")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $found = true;
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |if (!$found) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramShingles {
  /** Single-pass distinct word n-grams (first-occurrence order, like
    * array_distinct). Static so generated code makes one call per row.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i <= m - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}

/** Distinct word n-gram shingles from a token array in ONE pass.
  *
  * The higher-order-function form (`transform(sequence(...), i ->
  * concat_ws(element_at(tokens, ...)))`) is CodegenFallback, and worse:
  * the token-array subexpression inside the lambda is re-evaluated on
  * EVERY element reference — with `tokens(cleanText(text))` as input
  * that's two full regex passes over the document × n references ×
  * (m-n+1) grams, measured at ~18 ms/row — the silent dominant cost of
  * the entire dedup family. This kernel reads the token array once.
  */
case class NGramShinglesExpr(child: Expression, n: Int) extends StringArrayExpression {
  override def prettyName: String = "ngram_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(value: Any): Any =
    NGramShingles.compute(value.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = "graft.expressions.NGramShingles"
      s"${ev.value} = $helper.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** "id id id ..." encoding of a token array under a fixed small
  * vocabulary (OOV → 0) — the training-prep id-sequence step (q168).
  *
  * Why a kernel and not `transform + element_at(map literal)`: Catalyst's
  * GetMapValue on a MapType value is a LINEAR scan of the map per lookup,
  * so a 300-entry vocab costs 300 string comparisons per token — measured
  * at sf10 (86M corpus tokens) the literal-map encode ran 214-230 s where
  * even the shuffling broadcast-join shape it was meant to replace ran
  * ~23 s. This kernel keys a java HashMap by UTF8String (hash lookup,
  * O(1) per token, no per-token String allocation) and encodes the whole
  * array in one call per row: no join, no explode, no shuffle, token
  * order preserved by construction.
  */
object VocabEncodeIds {
  def build(vocab: Map[String, Int]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(UTF8String.fromString(k), Integer.valueOf(v)) }
    m
  }
  def compute(arr: ArrayData,
      vocab: java.util.HashMap[UTF8String, Integer]): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      val v = if (arr.isNullAt(i)) null else vocab.get(arr.getUTF8String(i))
      sb.append(if (v == null) 0 else v.intValue())
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class VocabEncodeIdsExpr(child: Expression, vocab: Map[String, Int])
    extends StringArrayExpression {
  override def prettyName: String = "vocab_encode_ids"
  override def dataType: DataType = StringType

  @transient private lazy val table = VocabEncodeIds.build(vocab)

  override def nullSafeEval(value: Any): Any =
    VocabEncodeIds.compute(value.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tRef = ctx.addReferenceObj("vocabTable", table, "java.util.HashMap")
      s"${ev.value} = graft.expressions.VocabEncodeIds.compute($a, $tRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface. */
object TextHashExpressions {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def minhashSigs(shingles: Column, numHashes: Int): Column =
    c(MinhashSignatures(e(shingles), numHashes))
  def simhash(tokens: Column): Column =
    c(SimhashSignature(e(tokens)))
  def ngramShingles(tokens: Column, n: Int): Column =
    c(NGramShinglesExpr(e(tokens), n))
  def vocabEncodeIds(tokens: Column, vocab: Map[String, Int]): Column =
    c(VocabEncodeIdsExpr(e(tokens), vocab))
}
