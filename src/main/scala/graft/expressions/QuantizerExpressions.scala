package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen kernels for the quantizer family (IVF assignment, PQ encode/ADC,
  * hyperplane-LSH signatures).
  *
  * These all score an `array<float>` row against a FIXED bank of constants
  * (centroids / codebooks / hyperplanes). Composing them from per-constant
  * column functions (a `least` + `when`-chain argmin, `transform` over a
  * `typedlit` codebook, 72 `vec_dot`s against literal arrays) either falls
  * back to interpreted higher-order functions or inlines thousands of
  * float literals into the generated Java — Janino then spends seconds
  * compiling each distinct plan (measured: ~3 s per ANN query at any data
  * size, pure fixed overhead), and the duplicated subtrees defeat
  * subexpression elimination. Each kernel here instead carries its
  * constant bank as ONE reference object (`ctx.addReferenceObj`) and
  * generates a tight primitive loop: tiny Java source, fast compile,
  * optimal per-row work — the shape the distributed assignment/encode
  * pass needs at 100-TB corpus scale.
  */
abstract class VectorBankExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }
  override def nullable: Boolean = true

  /** expected input dimension; a mismatched row is a pipeline bug — throw
    * loudly rather than emit a silently-wrong bucket/code
    */
  def dim: Int

  protected final def checkDim(n: Int): Unit =
    if (n != dim) throw new IllegalArgumentException(
      s"$prettyName: expected $dim-dim vector, got $n")
}

/** 0-based nearest-centroid id by squared L2 (first index wins ties) —
  * the IVF assignment pass.
  */
case class NearestCentroid(child: Expression, centers: Array[Array[Float]])
    extends VectorBankExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def dim: Int = centers(0).length

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    val n = a.numElements()
    checkDim(n)
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      var s = 0.0
      var i = 0
      while (i < n) { val d = a.getFloat(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("centers", centers, "float[][]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "nearest_centroid: expected $dim-dim vector, got " + $n);
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $j = 0; $j < $cRef.length; $j++) {
         |  float[] $row = $cRef[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $row[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Margin-gated multi-probe assignment: array<int> of up to `maxProbes`
  * nearest centroid ids, ascending by squared L2 (first-index tie-break).
  * The nearest id is always emitted; the j-th (j ≥ 2) only when its
  * distance is within the margin of the best — d_j ≤ d_1·(1+margin) —
  * so only vectors NEAR a Voronoi boundary probe extra cells (the
  * FAISS-nprobe analog for joins, but adaptive: interior vectors, the
  * vast majority, stay single-probe and candidate volume grows by the
  * boundary fraction rather than ×maxProbes). With margin = 0 this
  * degenerates to a one-element [nearest_centroid] array.
  */
case class NearestCentroids(
    child: Expression, centers: Array[Array[Float]],
    maxProbes: Int, margin: Double)
    extends VectorBankExpression {
  require(maxProbes >= 1, s"maxProbes=$maxProbes must be >= 1")
  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def dim: Int = centers(0).length

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    val n = a.numElements()
    checkDim(n)
    val m = maxProbes
    val bd = Array.fill(m)(Double.MaxValue)
    val bi = new Array[Int](m)
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      var s = 0.0
      var i = 0
      while (i < n) { val d = a.getFloat(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bd(m - 1)) {
        var pos = m - 1
        while (pos > 0 && s < bd(pos - 1)) { bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1 }
        bd(pos) = s; bi(pos) = j
      }
      j += 1
    }
    val cut = bd(0) * (1.0 + margin)
    var cnt = 1
    while (cnt < m && cnt < centers.length && bd(cnt) <= cut) cnt += 1
    new GenericArrayData(java.util.Arrays.copyOf(bi, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("centers", centers, "float[][]")
      val n = ctx.freshName("n")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      val pos = ctx.freshName("pos")
      val cut = ctx.freshName("cut")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "nearest_centroids: expected $dim-dim vector, got " + $n);
         |double[] $bd = new double[$maxProbes];
         |int[] $bi = new int[$maxProbes];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $j = 0; $j < $cRef.length; $j++) {
         |  float[] $row = $cRef[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $row[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd[$maxProbes - 1]) {
         |    int $pos = $maxProbes - 1;
         |    while ($pos > 0 && $s < $bd[$pos - 1]) {
         |      $bd[$pos] = $bd[$pos - 1]; $bi[$pos] = $bi[$pos - 1]; $pos--;
         |    }
         |    $bd[$pos] = $s; $bi[$pos] = $j;
         |  }
         |}
         |double $cut = $bd[0] * (1.0 + $margin);
         |int $cnt = 1;
         |while ($cnt < $maxProbes && $cnt < $cRef.length && $bd[$cnt] <= $cut) $cnt++;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bi, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> of m codebook indices (0-based, first-index tie-break per
  * subspace) — the PQ encode pass. codebooks: m × ksub × (dim/m).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends VectorBankExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length
  override def dim: Int = m * dsub

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    checkDim(a.numElements())
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var s = 0.0
        var i = 0
        while (i < dsub) { val d = a.getFloat(off + i).toDouble - cent(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cb = ctx.freshName("cb")
      val cent = ctx.freshName("cent")
      val off = ctx.freshName("off")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "pq_encode: expected $dim-dim vector, got " + $n);
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  float[][] $cb = $cbRef[$j];
         |  int $off = $j * $dsub;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    float[] $cent = $cb[$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $d = (double) $a.getFloat($off + $i) - (double) $cent[$i];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance: sum over subspaces of lut(j)(code(j)) — the compressed
  * scan of PQ search. Input is the array<int> code column; the per-query
  * lookup table is the constant bank.
  */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private val m = lut.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got ${other.simpleString}")
  }

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    if (a.numElements() != m) throw new IllegalArgumentException(
      s"pq_adc: expected $m codes, got ${a.numElements()}")
    var s = 0.0
    var j = 0
    while (j < m) { s += lut(j)(a.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lRef = ctx.addReferenceObj("lut", lut, "double[][]")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $m) throw new IllegalArgumentException(
         |  "pq_adc: expected $m codes, got " + $a.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) { $s += $lRef[$j][$a.getInt($j)]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures, all tables in one pass: for table t of
  * `planes` (tables × bits × dim), bit b is the sign of <vec, plane_tb>;
  * the output element t is (t << 48) | bits — table-tagged so signatures
  * from different tables never equi-join. One array<long> per row (the
  * vectors themselves are NOT carried through the downstream explode).
  */
case class HyperplaneSignatures(child: Expression, planes: Array[Array[Array[Float]]])
    extends VectorBankExpression {
  override def prettyName: String = "hyperplane_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val tables = planes.length
  private val bits = planes(0).length
  require(bits <= 48, s"bits=$bits must fit below the table tag")
  override def dim: Int = planes(0)(0).length

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    val n = a.numElements()
    checkDim(n)
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t)(b)
        var s = 0.0
        var i = 0
        while (i < n) { s += a.getFloat(i).toDouble * p(i); i += 1 }
        if (s >= 0.0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = (t.toLong << 48) | sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pRef = ctx.addReferenceObj("planes", planes, "float[][][]")
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "hyperplane_sigs: expected $dim-dim vector, got " + $n);
         |long[] $sigs = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    float[] $p = $pRef[$t][$b];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += (double) $a.getFloat($i) * (double) $p[$i];
         |    }
         |    if ($s >= 0.0) $sig |= (1L << $b);
         |  }
         |  $sigs[$t] = (((long) $t) << 48) | $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric per-vector int8 scalar quantization: scale = max|x|/127,
  * code_i = round(x_i/scale) in [-127, 127]. Output struct
  * (scale: float, codes: array<byte>) — a 4× footprint cut that, unlike
  * PQ, needs no training and reconstructs each component independently.
  * One pass, one output object per row.
  */
case class Int8Encode(child: Expression, expectedDim: Int)
    extends VectorBankExpression {
  override def prettyName: String = "int8_encode"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def dim: Int = expectedDim

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    val n = a.numElements()
    checkDim(n)
    var peak = 0.0f
    var i = 0
    while (i < n) {
      val v = a.getFloat(i); val m = if (v < 0) -v else v
      if (m > peak) peak = m
      i += 1
    }
    val scale = peak / 127.0f
    val codes = new Array[Byte](n)
    if (peak > 0.0f) {
      i = 0
      while (i < n) {
        val q = Math.round(a.getFloat(i).toDouble / scale).toInt
        codes(i) = Math.max(-127, Math.min(127, q)).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, new GenericArrayData(codes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val peak = ctx.freshName("peak")
      val v = ctx.freshName("v")
      val m = ctx.freshName("m")
      val scale = ctx.freshName("scale")
      val codes = ctx.freshName("codes")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "int8_encode: expected $dim-dim vector, got " + $n);
         |float $peak = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $v = $a.getFloat($i);
         |  float $m = $v < 0 ? -$v : $v;
         |  if ($m > $peak) $peak = $m;
         |}
         |float $scale = $peak / 127.0f;
         |byte[] $codes = new byte[$n];
         |if ($peak > 0.0f) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $q = (int) Math.round((double) $a.getFloat($i) / (double) $scale);
         |    $codes[$i] = (byte) Math.max(-127, Math.min(127, $q));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $scale, new org.apache.spark.sql.catalyst.util.GenericArrayData($codes) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compressed dot product against a fixed float query: sum_i codes[i]*q[i]
  * — the int8 ADC scan (multiply the result by the row's scale to get the
  * approximate inner product). Input array<byte>; per-row work is integer
  * loads and one FMA per component, no float reconstruction pass.
  */
case class Int8Dot(child: Expression, query: Array[Float])
    extends UnaryExpression {
  override def prettyName: String = "int8_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private val n = query.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<byte> input, got ${other.simpleString}")
  }

  override def nullSafeEval(value: Any): Any = {
    val a = value.asInstanceOf[ArrayData]
    if (a.numElements() != n) throw new IllegalArgumentException(
      s"int8_dot: expected $n codes, got ${a.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getByte(i).toDouble * query(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val qRef = ctx.addReferenceObj("query", query, "float[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $n) throw new IllegalArgumentException(
         |  "int8_dot: expected $n codes, got " + $a.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getByte($i) * (double) $qRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface. */
object QuantizerExpressions {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def nearestCentroid(vec: Column, centers: Array[Array[Float]]): Column =
    c(NearestCentroid(e(vec), centers))
  def nearestCentroids(
      vec: Column, centers: Array[Array[Float]], maxProbes: Int, margin: Double): Column =
    c(NearestCentroids(e(vec), centers, maxProbes, margin))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    c(PqEncode(e(vec), codebooks))
  def pqAdc(code: Column, lut: Array[Array[Double]]): Column =
    c(PqAdc(e(code), lut))
  def hyperplaneSigs(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    c(HyperplaneSignatures(e(vec), planes))
  def int8Encode(vec: Column, dim: Int): Column =
    c(Int8Encode(e(vec), dim))
  def int8Dot(codes: Column, query: Array[Float]): Column =
    c(Int8Dot(e(codes), query))
}
