package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SentimentSpec extends SparkSpec {

  private def run(texts: String*) = {
    import spark.implicits._
    texts.toDF("t").select(
      Sentiment.score(col("t")).as("s"),
      Sentiment.label(col("t")).as("l")).collect()
  }

  test("positive, negative, neutral classification") {
    val Array(pos, neg, neu) = run(
      "stocks surge to record high on strong profit growth",
      "shares crash as losses deepen and fear spreads",
      "the company held its annual meeting on tuesday")
    assert(pos.getDouble(0) > 0 && pos.getString(1) == "positive")
    assert(neg.getDouble(0) < 0 && neg.getString(1) == "negative")
    assert(neu.getDouble(0) == 0 && neu.getString(1) == "neutral")
  }

  test("score is bounded in [-1, 1] and empty text is neutral") {
    val Array(r) = run("")
    assert(r.getDouble(0) == 0.0 && r.getString(1) == "neutral")
    val Array(allPos) = run("gain gain gain gain")
    assert(allPos.getDouble(0) <= 1.0)
  }
}
