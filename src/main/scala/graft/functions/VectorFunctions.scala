package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.expressions.VectorExpressions

/** Dense-vector math over `array<float>` columns (SURVEY.md §2.1 O31-O33).
  *
  * The public entry points delegate to the whole-stage-codegen kernels in
  * graft.expressions.VectorExpressions (tight primitive loops). The
  * higher-order-function forms (`zip_with` + `aggregate`, suffixed `Hof`)
  * are kept as the readable reference implementation and correctness oracle
  * — they are CodegenFallback in Spark and interpret a lambda per element,
  * which is too slow for pairwise scans at corpus scale. Both accumulate in
  * double over the same element order, so results are bit-identical.
  */
object VectorFunctions {

  /** Inner product <a,b> (reference FAISS IndexFlatIP, py:428-430). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Squared L2 distance (reference FAISS IndexFlatL2 returns squared L2,
    * py:371-380).
    */
  def l2Sq(a: Column, b: Column): Column = VectorExpressions.l2Sq(a, b)

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Cosine similarity; null-safe zero-vector guard returns null. */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => d(x) * d(x)), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(normSq(a))

  // ------------------------------------------------------------------
  // Higher-order-function reference forms (oracle for the codegen path)
  // ------------------------------------------------------------------

  private def d(c: Column): Column = c.cast(DoubleType)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => d(x) * d(y)),
      lit(0.0),
      (acc, x) => acc + x)

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(dotHof(a, b) / (na * nb))
  }
}
