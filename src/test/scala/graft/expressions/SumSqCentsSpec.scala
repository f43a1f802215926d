package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SumSqCentsSpec extends SparkSpec {

  test("aggregator matches a hand computation and is partitioning-invariant") {
    import spark.implicits._
    val vals = Seq(0.1, 0.25, 1.0, -0.5, 3.337)
    val expected = vals.map { v =>
      val c = math.floor(v * 100).toLong; c * c
    }.sum
    val agg = udaf(SumSqCents)
    val one = vals.toDF("v").coalesce(1)
      .agg(agg(col("v"))).head().getLong(0)
    val many = vals.toDF("v").repartition(5)
      .agg(agg(col("v"))).head().getLong(0)
    assert(one == expected)
    assert(many == expected) // merge path produces the same exact Long
  }

  test("negative values floor toward -inf before squaring (not truncate)") {
    import spark.implicits._
    // floor(-0.5*100) = -50 exactly; floor(-0.015*100) = -2 (not -1)
    val agg = udaf(SumSqCents)
    val got = Seq(-0.015).toDF("v").agg(agg(col("v"))).head().getLong(0)
    assert(got == 4L)
  }
}
