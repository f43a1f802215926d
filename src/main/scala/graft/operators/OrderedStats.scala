package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Spill-safe exact ordered statistics.
  *
  * Spark's built-in `percentile` aggregate buffers every (value, count)
  * pair of a group in executor memory, which is the one aggregate shape
  * that can OOM at 100-TB group sizes. This is the disk-bounded exact
  * form: the only per-group total-order step is a window sort, and
  * Spark's sort is an external (spilling) sort — memory pressure
  * degrades to disk, never to OOM.
  *
  * Plan shape (and why it scales):
  *   1. one tiny `groupBy(count)` — non-null value count per group;
  *   2. `row_number()` over (group, value) — the sort spills; row_number
  *      itself is streaming (no partition buffering in WindowExec);
  *   3. broadcast-join the per-group counts back (the counts side is one
  *      row per group), keep ONLY the floor/ceil rank rows any requested
  *      percentile needs — at most 2·|ps| rows per group survive;
  *   4. one tiny hash aggregate interpolates.
  *
  * Semantics match SQL `percentile_cont` / Spark `percentile` (type-7
  * interpolation at h = (n-1)·p over non-null values). Groups with zero
  * non-null values are omitted (the built-in returns NULL for them —
  * callers needing that row can left-join the group universe).
  *
  * Parallelism is bounded by group cardinality — inherent to any exact
  * per-group total order. For low-cardinality groups at extreme scale the
  * GK sketch (`approx_percentile`, q65) remains the recommended path;
  * this form is for when exactness is required and is safe either way.
  *
  * Reference behavior: pandas `quantile` in the analytics summary
  * (ai_powered_financial_analysis.py:214-230), exact by construction.
  */
object OrderedStats {

  /** Exact interpolated percentiles per group, one (name, p) output
    * column per requested percentile, 0 <= p <= 1.
    */
  def exactPercentiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "OrderedStats: at least one percentile required")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"OrderedStats: percentile $n=$p outside [0,1]")
    }
    val vals = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast(DoubleType).as("__v"))
    val counts = vals.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    // 0-based rank within the group's ascending value order. Ties in __v
    // are broken arbitrarily by row_number — harmless, since tied values
    // interpolate to the tie.
    val ranked = vals
      .withColumn("__r", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("__v"))) - 1)
      .join(broadcast(counts), Seq(groupCol))
    def h(p: Double) = (col("__n") - 1).cast(DoubleType) * lit(p)
    val needed = ps.map { case (_, p) =>
      col("__r") === floor(h(p)).cast("long") || col("__r") === ceil(h(p)).cast("long")
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (name, p) =>
      Seq(
        max(when(col("__r") === floor(h(p)).cast("long"), col("__v"))).as(s"__lo_$name"),
        max(when(col("__r") === ceil(h(p)).cast("long"), col("__v"))).as(s"__hi_$name"),
        // h - floor(h) is constant per group (it depends only on __n)
        max(h(p) - floor(h(p))).as(s"__f_$name"))
    }
    val agged = ranked.filter(needed).groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, _) =>
      (col(s"__lo_$name") +
        col(s"__f_$name") * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
    }
    agged.select(col(groupCol) +: outs: _*)
  }
}
