package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RemixSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // three groups with very different weights
    ((1 to 100).map(i => (i.toLong, "big", 100L)) ++
      (101 to 140).map(i => (i.toLong, "mid", 100L)) ++
      (141 to 150).map(i => (i.toLong, "small", 100L)))
      .toDF("id", "g", "w")
  }

  test("every group is cut toward the smallest group's budget") {
    val kept = TrainingData.remixToBudget(corpus, "id", "g", "w")
      .groupBy("g").agg(sum("w").as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = 10 * 100L // smallest group total
    // md5 buckets are uniform-ish: each group lands near the target;
    // the SMALL group keeps everything (threshold 65536 = keep all)
    assert(kept("small") == target)
    assert(kept("big") <= target * 2, s"big kept ${kept("big")}")
    assert(kept("mid") <= target * 2, s"mid kept ${kept("mid")}")
    // and the cut actually happened
    assert(kept("big") < 100 * 100L && kept("mid") < 40 * 100L)
  }

  test("membership is deterministic and a pure function of (id, threshold)") {
    val a = TrainingData.remixToBudget(corpus, "id", "g", "w")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = TrainingData.remixToBudget(corpus, "id", "g", "w")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // manual recompute: bucket(id) < floor(65536 * target / total(g))
    val bucket = corpus.select(col("id"),
      conv(substring(md5(col("id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = Map("big" -> 10000L, "mid" -> 4000L, "small" -> 1000L)
    val expected = corpus.collect().filter { r =>
      val thr = 1000L * 65536 / totals(r.getString(1))
      bucket(r.getLong(0)) < thr
    }.map(_.getLong(0)).toSet
    assert(a == expected)
  }

  test("overflow-scale target weight fails loudly instead of dropping everything") {
    import spark.implicits._
    val huge = Seq((1L, "g1", 7.5e13.toLong), (2L, "g1", 7.5e13.toLong),
      (3L, "g2", 2.0e14.toLong)).toDF("id", "g", "w")
    val ex = intercept[Exception](
      TrainingData.remixToBudget(huge, "id", "g", "w").collect())
    assert(ex.getMessage.contains("remixToBudget") ||
      Option(ex.getCause).exists(_.getMessage.contains("remixToBudget")), ex.getMessage)
  }
}
