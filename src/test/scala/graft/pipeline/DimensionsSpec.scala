package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

class DimensionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2FromChangelog builds chained half-open version intervals") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "N"),
      (1L, 11L, ts("2024-02-01 00:00:00"), "P"),
      (1L, 12L, ts("2024-03-01 00:00:00"), "F"),
      (2L, 20L, ts("2024-01-15 00:00:00"), "N")).toDF("k", "seq", "at", "state")
    val hist = Dimensions.scd2FromChangelog(log, "k", "at", "seq")
      .orderBy("k", "seq").collect()
    // key 1: three chained versions
    assert(hist(0).getAs[Timestamp]("valid_from") == ts("2024-01-01 00:00:00"))
    assert(hist(0).getAs[Timestamp]("valid_to") == ts("2024-02-01 00:00:00"))
    assert(!hist(0).getAs[Boolean]("is_current"))
    assert(hist(1).getAs[Timestamp]("valid_to") == ts("2024-03-01 00:00:00"))
    assert(hist(2).getAs[Timestamp]("valid_to") == null)
    assert(hist(2).getAs[Boolean]("is_current"))
    // key 2: single version, current
    assert(hist(3).getAs[Boolean]("is_current"))
    // intervals chain exactly: every valid_to equals the next valid_from
  }

  test("applyCdc keeps the latest non-delete state and drops deleted keys") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "I", "a"),
      (1L, 2L, ts("2024-02-01 00:00:00"), "U", "b"),   // latest for key 1
      (2L, 3L, ts("2024-01-01 00:00:00"), "I", "x"),
      (2L, 4L, ts("2024-03-01 00:00:00"), "D", "x"),   // key 2 deleted
      (3L, 5L, ts("2024-01-05 00:00:00"), "I", "z"))
      .toDF("k", "seq", "at", "op", "v")
    val out = Dimensions.applyCdc(log, "k", "at", "seq", "op")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "b", 3L -> "z"))
  }

  test("applyCdc same-timestamp ops resolve by tiebreak (delete last wins)") {
    import spark.implicits._
    val at = ts("2024-06-01 00:00:00")
    val log = Seq((1L, 1L, at, "U", "a"), (1L, 2L, at, "D", "a"))
      .toDF("k", "seq", "at", "op", "v")
    assert(Dimensions.applyCdc(log, "k", "at", "seq", "op").count() == 0)
    val log2 = Seq((1L, 2L, at, "U", "late"), (1L, 1L, at, "D", "x"))
      .toDF("k", "seq", "at", "op", "v")
    val out = Dimensions.applyCdc(log2, "k", "at", "seq", "op")
      .select("v").collect().map(_.getString(0)).toSeq
    assert(out == Seq("late"))
  }

  test("same-timestamp changes version deterministically by tiebreak") {
    import spark.implicits._
    val at = ts("2024-06-01 00:00:00")
    val log = Seq((1L, 2L, at, "b"), (1L, 1L, at, "a")).toDF("k", "seq", "at", "state")
    val hist = Dimensions.scd2FromChangelog(log, "k", "at", "seq")
      .orderBy("seq").collect()
    assert(hist(0).getAs[String]("state") == "a" && !hist(0).getAs[Boolean]("is_current"))
    assert(hist(1).getAs[String]("state") == "b" && hist(1).getAs[Boolean]("is_current"))
  }
}
