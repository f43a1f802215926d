package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import scala.util.Random

class OrderedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, ps: Seq[(String, Double)]) =
    df.groupBy("g").agg(
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.head,
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.tail: _*)

  private def assertMatches(rows: Seq[(String, java.lang.Double)], ps: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("g", "v")
    val ours = OrderedStats.exactPercentiles(df, "g", "v", ps)
      .orderBy("g").collect()
    val ref = builtin(df, ps)
      .filter(col(ps.head._1).isNotNull) // all-null groups are omitted by ours
      .orderBy("g").collect()
    assert(ours.length == ref.length, s"group count: ${ours.length} vs ${ref.length}")
    ours.zip(ref).foreach { case (a: Row, b: Row) =>
      assert(a.getString(0) == b.getString(0))
      ps.indices.foreach { i =>
        val (x, y) = (a.getDouble(i + 1), b.getDouble(i + 1))
        assert(math.abs(x - y) < 1e-9, s"group ${a.getString(0)} col ${ps(i)._1}: $x vs $y")
      }
    }
  }

  test("matches the built-in percentile on random groups (ties included)") {
    val rnd = new Random(47)
    // values drawn from a small integer set so ties are guaranteed
    val rows = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(5)}", java.lang.Double.valueOf(rnd.nextInt(40).toDouble))
    }
    assertMatches(rows, Seq("p50" -> 0.5, "p95" -> 0.95, "p01" -> 0.01))
  }

  test("singleton and pair groups interpolate exactly") {
    assertMatches(
      Seq(("a", java.lang.Double.valueOf(7.0)),
        ("b", java.lang.Double.valueOf(1.0)), ("b", java.lang.Double.valueOf(2.0))),
      Seq("p50" -> 0.5, "p95" -> 0.95))
  }

  test("nulls are ignored; all-null groups are omitted") {
    val rows = Seq(
      ("a", java.lang.Double.valueOf(1.0)), ("a", null.asInstanceOf[java.lang.Double]),
      ("a", java.lang.Double.valueOf(3.0)),
      ("z", null.asInstanceOf[java.lang.Double]))
    val out = OrderedStats.exactPercentiles(
      rows.toDF("g", "v"), "g", "v", Seq("p50" -> 0.5)).collect()
    assert(out.length == 1 && out.head.getString(0) == "a")
    assert(out.head.getDouble(1) == 2.0) // median of (1, 3) ignoring the null
  }

  test("boundary percentiles p=0 and p=1 return min and max") {
    val rows = Seq("a" -> 5.0, "a" -> 9.0, "a" -> 1.0)
      .map { case (g, v) => (g, java.lang.Double.valueOf(v)) }
    val out = OrderedStats.exactPercentiles(
      rows.toDF("g", "v"), "g", "v", Seq("lo" -> 0.0, "hi" -> 1.0)).collect()
    assert(out.head.getDouble(1) == 1.0 && out.head.getDouble(2) == 9.0)
  }

  test("plan is external-sort based: a window sort, no percentile buffer") {
    val df = (1 to 100).map(i => (s"g${i % 3}", java.lang.Double.valueOf(i.toDouble)))
      .toDF("g", "v")
    val plan = OrderedStats.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("Sort"), plan)
    assert(!plan.toLowerCase.contains("percentile"), plan)
  }
}
