package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The codegen kernels must be bit-identical to the higher-order-function
  * reference forms (same double accumulation order), including null
  * semantics on length mismatch and null elements.
  */
class VectorExpressionsSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    Seq.fill(300)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("a", "b").cache()
  }

  test("dot is bit-identical to the HOF oracle") {
    val rows = vecs.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("oracle")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("l2Sq is bit-identical to the HOF oracle") {
    val rows = vecs.select(
      VectorExpressions.l2Sq(col("a"), col("b")).as("fast"),
      VectorFunctions.l2SqHof(col("a"), col("b")).as("oracle")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine is bit-identical to the HOF oracle") {
    val rows = vecs.select(
      VectorExpressions.cosine(col("a"), col("b")).as("fast"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("oracle")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("length mismatch and zero vectors null out like the HOF forms") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),  // length mismatch
      (Seq(0f, 0f), Seq(1f, 1f)))      // zero vector (cosine)
      .toDF("a", "b")
    val r = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("d"),
      VectorExpressions.cosine(col("a"), col("b")).as("c")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(!r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("kernels run inside WholeStageCodegen (not CodegenFallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val exec = vecs.select(VectorExpressions.dot(col("a"), col("b")))
      .queryExecution.executedPlan
    val inCodegen = exec.collect { case w: WholeStageCodegenExec => w }
    assert(inCodegen.nonEmpty && exec.toString.contains("vec_dot"), s"plan:\n$exec")
  }

  test("interpreted eval path matches codegen (nullSafeEval coverage)") {
    // force the interpreted path via a fresh expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = Literal.create(new GenericArrayData(Array(1f, 2f, 3f)),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val b = Literal.create(new GenericArrayData(Array(4f, 5f, 6f)),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    assert(DotProduct(a, b).eval(null) == 32.0)
    assert(L2SquaredDistance(a, b).eval(null) == 27.0)
    val c = CosineSimilarity(a, a).eval(null).asInstanceOf[Double]
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
