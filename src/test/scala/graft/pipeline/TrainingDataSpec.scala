package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class TrainingDataSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  test("assignSplit is deterministic, total, and id-addressed") {
    val df = spark.range(0, 2000).toDF("id")
    val a = TrainingData.assignSplit(df, "id")
    val b = TrainingData.assignSplit(df, "id")
    assert(a.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    // same id → same split on every evaluation
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // roughly 12/2/2 of 16 buckets; generous bounds for 2000 ids
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1200 && counts("train") < 1700)
    assert(counts("val") > 100 && counts("test") > 100)
  }

  test("packSequences equals the single-window global form") {
    val docs = (1L to 500L).map { i =>
      (i, if (i % 3 == 0) "de" else "en", (i * 37 % 90) + 1)
    }.toDF("doc_id", "lang", "n_tokens")
    val packed = TrainingData
      .packSequences(docs, "doc_id", "lang", "n_tokens", capTokens = 100L,
        numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // reference: plain global per-group window (the form that dies at scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 100L))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(packed === expected)
  }

  test("packSequences keeps documents whole and packs contiguous") {
    val docs = Seq((1L, "en", 60L), (2L, "en", 60L), (3L, "en", 60L),
      (4L, "en", 10L)).toDF("doc_id", "lang", "n_tokens")
    val packed = TrainingData
      .packSequences(docs, "doc_id", "lang", "n_tokens", capTokens = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // offsets 0,60,120,180 → packs 0,0,1,1
    assert(packed === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("gapFillDaily densifies and carries forward, zero before first obs") {
    val ev = Seq(
      (1L, "2024-01-02", 10L),
      (1L, "2024-01-04", 20L),
      (2L, "2024-01-03", 5L))
      .toDF("k", "d", "v")
      .select(col("k"), to_timestamp(col("d")).as("d"), col("v"))
    val out = TrainingData.gapFillDaily(ev, "k", "d", "v")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10), r.getLong(2)))
      .toSet
    // spine is global min..max = Jan 2..4 for every key
    assert(out === Set(
      (1L, "2024-01-02", 10L), (1L, "2024-01-03", 10L), (1L, "2024-01-04", 20L),
      (2L, "2024-01-02", 0L), (2L, "2024-01-03", 5L), (2L, "2024-01-04", 5L)))
  }

  test("upsertLatest: updates win, new keys append, untouched rows survive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = TrainingData.upsertLatest(base, upd, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "Z"))
  }

  test("contaminatedDocIds flags shared shingles only") {
    val eval_ = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix text the quick brown fox jumps over the end"), // shares 20-gram
      (2L, "completely unrelated content with no overlap at all xyz"),
      (3L, "short")) // below shingle length
      .toDF("doc_id", "text")
    val out = TrainingData.contaminatedDocIds(train, eval_, "doc_id", "text", n = 20)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }

  test("contaminatedDocIds broadcasts the eval side even when the size " +
      "estimator declines (the r20 sf10 SMJ-flip guard)") {
    // sf10 finding: Spark's size estimate of the exploded+distinct eval
    // shingle set crosses autoBroadcastJoinThreshold with the corpus and
    // the semi join silently flips to SortMergeJoin — the full train
    // shingle set shuffled+sorted on a 20-char string key. The explicit
    // hint must hold independent of the estimate: model the estimator
    // declining by disabling auto-broadcast outright.
    val eval_ = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix text the quick brown fox jumps over the end"),
      (2L, "completely unrelated content with no overlap at all xyz"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = TrainingData.contaminatedDocIds(train, eval_, "doc_id", "text", n = 20)
      val pHinted = hinted.queryExecution.executedPlan.toString
      assert(pHinted.contains("BroadcastHashJoin") && pHinted.contains("LeftSemi"), pHinted)
      assert(hinted.collect().map(_.getLong(0)).toSet === Set(1L))
      val unhinted = TrainingData.contaminatedDocIds(
        train, eval_, "doc_id", "text", n = 20, broadcastEval = false)
      val pUnhinted = unhinted.queryExecution.executedPlan.toString
      assert(!pUnhinted.contains("BroadcastHashJoin"), pUnhinted)
      // both shapes compute the same membership
      assert(unhinted.collect().map(_.getLong(0)).toSet === Set(1L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("redactPii replaces and counts every kind") {
    val df = Seq((1L, "mail a.b@x.io and b@y.co tel 555-123-4567 ssn 123-45-6789 clean"))
      .toDF("id", "text")
    val r = TrainingData.redactPii(df, "text").collect()(0)
    assert(r.getAs[Int]("n_emails") === 2)
    assert(r.getAs[Int]("n_phones") === 1)
    assert(r.getAs[Int]("n_ssns") === 1)
    val red = r.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<SSN>"))
    assert(!red.contains("@") && !red.contains("123-45-6789"))
  }
}
