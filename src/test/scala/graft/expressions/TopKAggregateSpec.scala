package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregateSpec extends SparkSpec {

  private lazy val data = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1L to 5000L).map(i => (s"g${rnd.nextInt(7)}", rnd.nextInt(100).toDouble, i))
      .toDF("g", "s", "id").cache()
  }

  test("topKByScore equals window row_number top-k (including score ties)") {
    val agg = data.groupBy("g")
      .agg(TopKAggregate.topKByScore(col("s"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rank", "e")))
      .select(col("g"), col("rank"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val win = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("rank"), col("s"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(agg == win)
  }

  test("partial (map-side) aggregation is planned") {
    val plan = data.groupBy("g")
      .agg(TopKAggregate.topKByScore(col("s"), col("id"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_score"), plan)
  }

  test("buffer round-trips through serialization") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 2L), (3.0, 7L), (9.0, 1L), (5.0, 1L)).foreach((buf.add _).tupled)
    val back = TopKBuffer.fromBytes(3, buf.toBytes)
    assert(back.sortedDesc.toSeq == Seq((9.0, 1L), (5.0, 1L), (5.0, 2L)))
  }

  test("NaN scores rank greatest, matching the window DESC order") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", Double.NaN, 2L), ("a", 5.0, 3L), ("a", 2.0, 4L))
      .toDF("g", "s", "id")
    val agg = df.groupBy("g")
      .agg(TopKAggregate.topKByScore(col("s"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("e")).select(col("e.id"))
      .collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("rn").select("id").collect().map(_.getLong(0)).toSeq
    assert(agg == win) // NaN first in both
  }

  test("groups smaller than k return all their rows") {
    import spark.implicits._
    val small = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "s", "id")
    val out = small.groupBy("g")
      .agg(TopKAggregate.topKByScore(col("s"), col("id"), 10).as("top"))
      .select(size(col("top"))).head().getInt(0)
    assert(out == 2)
  }
}
