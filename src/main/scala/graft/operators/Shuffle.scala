package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-management utilities for the 100-TB design brief.
  *
  * AQE's skew-join splitting (on in EngineSession) handles most runtime
  * skew; these are the explicit tools for the cases AQE can't fix:
  * aggregation skew (one hot key overwhelming a single reducer) and
  * repeated joins on the same key (bucketing to pre-pay the shuffle once).
  */
object Shuffle {

  /** Two-phase salted aggregation for skewed group keys: phase 1 aggregates
    * on (key, salt) — spreading a hot key over `salts` reducers — phase 2
    * combines the partials per key. Supports the decomposable aggregates
    * (count / sum); results are identical to a direct groupBy.
    *
    * The salt is deliberately PLACEMENT-derived. A content-derived salt
    * (xxhash64 over the row) reads as more deterministic but collapses on
    * the canonical skew shape — a hot key whose rows are IDENTICAL
    * (heartbeats, default-valued events): every duplicate hashes to one
    * salt and the single-reducer hotspot returns. The salt value never
    * reaches the result (phase 2 sums it away, and count/sum are
    * decomposable), so retries changing the placement salt cannot change
    * the answer; operators needing an order-sensitive salt must derive
    * their own.
    */
  def saltedCountSum(
      df: DataFrame, keys: Seq[String], sumCol: String, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(sumCol)).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as(s"sum_$sumCol"))
  }

  /** Salt one side of a join against a hot-key dimension: replicate the
    * small side `salts` times and salt the big side, turning one hot
    * reducer into `salts` balanced ones. `bigSide` gains `__salt` from a
    * deterministic spread; `smallSide` is exploded over all salt values.
    * Join both on `keys :+ "__salt"`. AQE skew-join makes this rarely
    * necessary; kept for plan-stable pipelines that disable AQE.
    */
  def saltForJoin(
      bigSide: DataFrame, smallSide: DataFrame,
      salts: Int): (DataFrame, DataFrame) = {
    val big = bigSide.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val small = smallSide.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    (big, small)
  }

  /** Write a table bucketed (and sorted) by the join key: co-located,
    * co-sorted scans let subsequent equi-joins on `bucketCol` skip both the
    * shuffle and the sort — the right trade when a fact table is joined on
    * the same key by many downstream queries.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    writeBucketed(df, table, bucketCol, numBuckets, Seq(bucketCol))

  /** [[writeBucketed]] with an explicit in-bucket sort prefix — for
    * consumers whose required ordering extends past the bucket key (the
    * as-of merge exec wants (key, ts)): files land pre-sorted so the
    * scan-side sort is a cheap (often elided) run over sorted input.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)

  /** True if the executed plan of `df` contains any shuffle exchange
    * (hash, range, or single-partition — matching only hashpartitioning
    * would let a sort-based regression slip past the audit).
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Repartition `df` ONLY when its source grants too little scan
    * parallelism for an expensive downstream derivation.
    *
    * Spark assigns a parquet row group to exactly one task, so a
    * compacted single-file / oversized-row-group source — a routine
    * hazard in real lakes, and the local testdata's layout at every
    * SF — scans as ONE task, and everything below the first exchange
    * inherits that width (the round-14 serial-scan finding; SortedDerive
    * covers the queries whose plan already ends in a sort to defer past).
    * Pipelines whose filters/joins CONSUME the derived columns can't
    * defer; their only lever is an explicit exchange before the
    * derivation — pure waste on a well-split source, a core-count win on
    * a degenerate one. This helper makes the choice data-dependent:
    * `df.rdd.getNumPartitions` (plan-time — compiles the plan, runs no
    * job) reveals the width the source actually granted, and the
    * round-robin repartition is added only below the floor (default:
    * `sparkContext.defaultParallelism`). Streaming frames pass through —
    * their micro-batch sources re-plan each batch.
    */
  def ensureMinScanWidth(df: DataFrame, minPartitions: Int = 0): DataFrame = {
    if (df.isStreaming) df
    else {
      val floor =
        if (minPartitions > 0) minPartitions
        else df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= floor) df else df.repartition(floor)
    }
  }
}
