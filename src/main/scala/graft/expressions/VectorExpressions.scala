package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen vector kernels over `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`, the forms in
  * graft.functions.VectorFunctions) are CodegenFallback — every element goes
  * through an interpreted lambda with boxing. These expressions generate a
  * tight primitive loop instead, which is the difference between an
  * interpreted ~10k ops/s/core pairwise scan and a memory-bound one at 100-TB
  * corpus scale. Semantics are bit-identical to the HOF forms (double
  * accumulation in element order, null on length mismatch or null element);
  * the HOF forms remain the correctness oracle in VectorExpressionsSpec.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** scalar kernel over equal-length arrays with no null elements */
  protected def kernel(a: ArrayData, b: ArrayData, n: Int): Double
  /** java source for the loop body accumulating into `s` with index `i`.
    * All local names are caller-supplied `ctx.freshName`s — fixed names like
    * a literal `i` collide with enclosing generated code (Java forbids
    * shadowing an outer local), Janino throws, and Spark silently falls back
    * to interpreted projection: the exact failure mode this class exists to
    * avoid.
    */
  protected def javaLoopBody(ctx: CodegenContext, a: String, b: String,
      i: String, s: String): String
  /** java source finishing `s` into the result (identity by default) */
  protected def javaFinish(s: String): String = s

  private def anyNullElement(x: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return true; i += 1 }
    false
  }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    // zip_with pads a shorter array with nulls, which nulls the whole sum —
    // mirror that as null-on-length-mismatch
    if (n != b.numElements() || anyNullElement(a, n) || anyNullElement(b, n)) null
    else kernel(a, b, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val body = nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val anyNull = ctx.freshName("anyNull")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      ${javaLoopBody(ctx, a, b, i, s)}
         |    }
         |    ${ev.value} = ${javaFinish(s)};
         |  }
         |}
       """.stripMargin
    })
    body
  }
}

/** <a,b> — the reference's IndexFlatIP scoring (reference
  * ai_powered_financial_analysis.py:428-430).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  protected def kernel(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  protected def javaLoopBody(ctx: CodegenContext, a: String, b: String,
      i: String, s: String): String =
    s"$s += (double) $a.getFloat($i) * (double) $b.getFloat($i);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance — IndexFlatL2 semantics (py:371-380). */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  protected def kernel(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }
  protected def javaLoopBody(ctx: CodegenContext, a: String, b: String,
      i: String, s: String): String = {
    val d = ctx.freshName("d")
    s"""double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i); $s += $d * $d;"""
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in one pass (dot and both norms in a single loop);
  * null for zero vectors, matching VectorFunctions.cosine.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  protected def kernel(a: ArrayData, b: ArrayData, n: Int): Double =
    throw new IllegalStateException("unused — eval overridden")

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  protected def javaLoopBody(ctx: CodegenContext, a: String, b: String,
      i: String, s: String): String = ""

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($bad || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the codegen kernels. */
object VectorExpressions {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def l2Sq(a: Column, b: Column): Column = c(L2SquaredDistance(e(a), e(b)))
  def l2(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.sqrt(l2Sq(a, b))
  def cosine(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
}
