package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector math over `array<float>` columns (SURVEY.md §2.1 O31-O33).
  *
  * Built on higher-order functions (`zip_with` + `aggregate`), which Catalyst
  * codegens; accumulation is promoted to double so 64-384-dim float sums are
  * stable across engines. These are the exact forms used by the top-k oracle
  * queries; `graft.operators.Similarity` composes them into search APIs.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** Inner product <a,b> (reference FAISS IndexFlatIP, py:428-430). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => d(x) * d(y)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 distance (reference FAISS IndexFlatL2 returns squared L2,
    * py:371-380).
    */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  def normSq(a: Column): Column =
    aggregate(transform(a, x => d(x) * d(x)), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe zero-vector guard returns null. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(dot(a, b) / (na * nb))
  }
}
