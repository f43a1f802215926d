package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import DataQuality._

  test("audit computes all rules in one pass with correct values") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a@x.com"), 10.0),
      (2L, None, 50.0),
      (3L, Some("bad"), 200.0),
      (3L, Some("c@y.org"), -5.0)).toDF("id", "email", "v")
    val out = audit(df, Seq(
      rowCount,
      completeness("email"),
      uniqueness(Seq("id")),
      inRange("v", 0.0, 100.0),
      matchesPattern("email", "^[^@]+@[^@]+\\.[a-z]+$"),
      minOf("v"), maxOf("v")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_rows") == 4.0)
    assert(out("completeness_email") == 0.75)
    assert(out("uniqueness_id") == 0.75)
    assert(out("in_range_v") == 0.5)
    assert(out("pattern_email") == 0.5)
    assert(out("min_v") == -5.0 && out("max_v") == 200.0)
  }

  test("audit is a single job: one aggregate over the source") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "v")
    val plan = audit(df, Seq(rowCount, completeness("v"), minOf("v"), maxOf("v")))
      .queryExecution.optimizedPlan.toString
    // all rules fold into one Aggregate node, not one per rule
    assert("Aggregate \\[".r.findAllIn(plan).size == 1, plan)
  }

  test("audit handles rule names needing quoting and rejects empty rule sets") {
    import spark.implicits._
    val df = Seq((1, 2.0)).toDF("id", "a value")
    val out = audit(df, Seq(completeness("`a value`"), rowCount))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_rows") == 1.0)
    intercept[IllegalArgumentException](audit(df, Seq.empty))
  }

  test("orphanCount finds FK violations, ignores null FKs") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    assert(orphanCount(fact, "fk", dim, "pk") == 1L)
    assert(orphanCount(fact.filter(col("fk") < 3), "fk", dim, "pk") == 0L)
  }
}
