package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}
import graft.core.Tables

/** Sketch-based aggregation accuracy: at 100 TB, exact count-distinct is a
  * full shuffle of every key; HyperLogLog gives a bounded-memory,
  * one-pass answer. The engine relies on Spark's built-in
  * approx_count_distinct — this spec pins its error envelope on real data
  * so a regression (or misuse with too-coarse rsd) shows up.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.table(spark, TestSpark.sf0001, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("grouped sketches stay accurate per group") {
    val li = Tables.table(spark, TestSpark.sf0001, "lineitem")
    val rows = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).collect()
    rows.foreach { r =>
      val e = r.getLong(1).toDouble; val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.08, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
