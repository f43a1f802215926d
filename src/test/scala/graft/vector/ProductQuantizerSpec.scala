package graft.vector

import graft.SparkSpec
import graft.operators.Similarity

class ProductQuantizerSpec extends SparkSpec {

  // clustered corpus: PQ recall depends on structure, like real embeddings
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian().toFloat * 2))
    (0L until 400L).map { i =>
      val c = centers((i % 10).toInt)
      (i, c.map(v => v + rnd.nextGaussian().toFloat * 0.3f).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  private val query = {
    val rnd = new scala.util.Random(67)
    Array.fill(32)(rnd.nextGaussian().toFloat * 2)
  }

  private lazy val pq = ProductQuantizer.train(corpus, "embedding", dim = 32, m = 8, ksub = 32)
  private lazy val encoded = pq.encode(corpus, "embedding").cache()

  test("encode emits m codes in [0, ksub)") {
    val codes = encoded.select("pq_code").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 32)))
  }

  test("encoding is deterministic") {
    val a = encoded.select("vec_id", "pq_code").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = pq.encode(corpus, "embedding").select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("ADC distance approximates true squared L2") {
    import org.apache.spark.sql.functions._
    val rows = encoded.select(
      pq.adcExpr(col("pq_code"), query).as("adc"),
      graft.functions.VectorFunctions.l2Sq(col("embedding"), Similarity.vecLit(query)).as("true"))
      .collect()
    // rank correlation proxy: mean relative error bounded (lossy but sane)
    val relErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1)) / (r.getDouble(1) + 1e-9))
    assert(relErr.sum / relErr.length < 0.5, s"mean rel err ${relErr.sum / relErr.length}")
  }

  test("shortlist + exact rerank recovers >= 90% of true top-10") {
    val exact = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.L2)
      .collect().map(_.getLong(0)).toSet
    val got = pq.search(encoded, "vec_id", "embedding", "pq_code", query, k = 10, shortlist = 60)
      .collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall got=$got exact=$exact")
  }
}
