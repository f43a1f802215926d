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
