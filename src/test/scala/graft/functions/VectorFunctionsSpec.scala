package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import VectorFunctions._

  private def pair(a: Seq[Float], b: Seq[Float]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  test("dot matches hand computation") {
    val r = pair(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(dot(col("a"), col("b"))).head().getDouble(0)
    assert(r == 32.0)
  }

  test("l2Sq / l2 match hand computation") {
    val df = pair(Seq(1f, 2f), Seq(4f, 6f))
    assert(df.select(l2Sq(col("a"), col("b"))).head().getDouble(0) == 25.0)
    assert(df.select(l2(col("a"), col("b"))).head().getDouble(0) == 5.0)
  }

  test("cosine of parallel vectors is 1, orthogonal is 0, zero vector is null") {
    val p = pair(Seq(2f, 0f), Seq(4f, 0f)).select(cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(p - 1.0) < 1e-12)
    val o = pair(Seq(1f, 0f), Seq(0f, 1f)).select(cosine(col("a"), col("b"))).head().getDouble(0)
    assert(o == 0.0)
    val z = pair(Seq(0f, 0f), Seq(1f, 1f)).select(cosine(col("a"), col("b"))).head()
    assert(z.isNullAt(0))
  }

  test("cosine stays within [-1, 1] on random vectors (seeded property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(16)(rnd.nextFloat() * 2 - 1),
      Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val vals = rows.toDF("a", "b").select(cosine(col("a"), col("b"))).collect()
    vals.foreach { r =>
      if (!r.isNullAt(0)) {
        val c = r.getDouble(0)
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      }
    }
  }

  test("norm is sqrt of normSq and l2(a,a)=0") {
    val df = pair(Seq(3f, 4f), Seq(3f, 4f))
    assert(df.select(norm(col("a"))).head().getDouble(0) == 5.0)
    assert(df.select(l2(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }
}
