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
    * probe the width the source actually granted, and add the round-robin
    * repartition only below the floor (default:
    * `sparkContext.defaultParallelism`). Streaming frames pass through —
    * their micro-batch sources re-plan each batch.
    *
    * The probe (`df.rdd.getNumPartitions`) runs ONLY when the physical
    * plan contains no Exchange. That's not a cost nicety: under AQE (on
    * in every EngineSession) `Dataset.rdd` forces
    * `getFinalPhysicalPlan`, which EXECUTES every shuffle stage in the
    * plan — an exchange-containing input would pay its upstream shuffles
    * twice (probe + real query, with no cross-execution shuffle reuse).
    * An exchange-free plan has no query stages to execute, so there the
    * probe really is plan-time; and a plan that already shuffles runs
    * its downstream at `spark.sql.shuffle.partitions` width anyway, so
    * the guard has nothing to fix — pass through.
    */
  def ensureMinScanWidth(df: DataFrame, minPartitions: Int = 0): DataFrame = {
    if (df.isStreaming) df
    else if (df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])) df
    else {
      val floor =
        if (minPartitions > 0) minPartitions
        else df.sparkSession.sparkContext.defaultParallelism
      if (effectiveScanWidth(df, floor) >= floor) df else df.repartition(floor)
    }
  }

  /** The number of tasks that will actually CARRY ROWS when `df`'s
    * (exchange-free) source scans — the honest input to the width floor.
    *
    * `rdd.getNumPartitions` reports PLANNED byte-range splits, and Spark
    * plans ~defaultParallelism of them on any large file
    * (`maxSplitBytes = min(maxPartitionBytes, max(openCost,
    * bytes/defaultParallelism))`). But a parquet ROW GROUP is the minimum
    * split unit — each row group's rows land in exactly one task — so a
    * compacted single-file table caps out at its row-group count no
    * matter what was planned. Measured on the sf10 layout: documents
    * (500k rows, 54 MB) = 1 row group with 14 planned splits; events
    * (10M rows, 152 MB) = 2 row groups with 32 planned — a
    * planned-width probe declares that scan "wide enough" at floor 32
    * while 30 of its 32 tasks read zero rows.
    *
    * The cap is read from parquet footers (metadata-only), and ONLY when
    * cheaper signals can't already answer: planned width below the floor
    * answers by itself, a table with ≥ floor FILES is ≥ floor row groups
    * (at 100 TB, thousands of files — no footer is ever read), and
    * non-parquet / multi-leaf / unreadable-footer plans fall back to the
    * planned width (the prior behavior, never a crash).
    */
  private[graft] def effectiveScanWidth(df: DataFrame, floor: Int): Int = {
    val planned = df.rdd.getNumPartitions
    if (planned < floor) return planned
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans match {
      case Seq(scan) => rowGroupCappedWidth(scan, planned, floor)
      case _ => planned
    }
  }

  /** Row-group cap for one parquet scan: the shared core of
    * [[effectiveScanWidth]] and [[graft.WidthAudit]] (the audit must not
    * carry its own drifting copy of the dispatch it audits — ADVICE r16).
    *
    * The file list comes from the scan's PRUNED listing
    * (`selectedPartitions` — static partition pruning applied), not
    * `relation.location.inputFiles`: the relation lists every file in the
    * table, so a partition-pruned scan over a many-file table would clear
    * the `>= floor` shortcut on files that are not even read, and the
    * guard would declare a one-compacted-file pruned subset wide (ADVICE
    * r16). `dynamicallySelectedPartitions` would also fold in runtime DPP
    * but is Scala-protected in FileSourceScanLike (and its subqueries may
    * not have executed at probe time); static pruning covers the hazard
    * as described. Non-parquet scans and listing failures return the
    * planned width untouched.
    */
  private[graft] def rowGroupCappedWidth(
      scan: org.apache.spark.sql.execution.FileSourceScanExec,
      planned: Int, floor: Int): Int = {
    if (!scan.relation.fileFormat
        .isInstanceOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      return planned
    try {
      val listing = scan.selectedPartitions
      if (listing.totalNumberOfFiles >= floor) planned
      else {
        val conf = scan.relation.sparkSession.sessionState.newHadoopConf()
        val rowGroups = listing.filePartitionIterator
          .flatMap(_.files).map(_.getPath).toSeq.distinct.map { p =>
            val in = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
            try in.getFooter.getBlocks.size finally in.close()
          }.sum
        math.min(planned, math.max(1, rowGroups))
      }
    } catch { case scala.util.control.NonFatal(_) => planned }
  }

  /** The scan-width decision packaged as a RULE ([[ensureMinScanWidth]]
    * was per-call-site judgment: applied where it won, hand-reverted on
    * the decode-floor aggregates where it lost — a boundary that lives in
    * people's heads won't survive the next 50 queries).
    *
    * Build `derive(source)` and widen the source ONLY when both measured
    * conditions hold:
    *
    *  1. the source grants fewer scan partitions than the floor (the
    *     single-file / oversized-row-group layout hazard — Spark assigns
    *     a parquet row group to exactly one task); and
    *  2. the built plan runs EXPENSIVE per-row work at that source width —
    *     a scan-side segment (below the first Exchange) whose
    *     projections / filters / generators contain regex, string-split,
    *     sentence, higher-order-lambda, hash, or black-box-UDF
    *     expressions.
    *
    * Aggregate update functions are deliberately NOT "expensive": partial
    * aggregation below the exchange is accumulator-cheap, the serial
    * parquet decode remains either way, and the added exchange of raw
    * rows is pure cost — measured: q29's cast+sum partials REGRESS
    * 5.4 → 8.8 s at sf1 when widened, while the curation battery
    * (regex/split per row, condition 2) drops 8.4 → 3.6 s. Sources whose
    * plan already contains an Exchange pass through unprobed (same AQE
    * rationale as [[ensureMinScanWidth]]; their downstream runs at
    * shuffle width anyway).
    *
    * The decision is plan-time: `derive` is invoked once for the probe
    * plan and once more against the widened source only when the rule
    * fires, and the exchange-free source probe runs no job.
    */
  def widenPlan(source: DataFrame, minPartitions: Int = 0)(
      derive: DataFrame => DataFrame): DataFrame = {
    val plain = derive(source)
    if (source.isStreaming || plain.isStreaming) return plain
    if (source.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])) return plain
    val floor =
      if (minPartitions > 0) minPartitions
      else source.sparkSession.sparkContext.defaultParallelism
    if (effectiveScanWidth(source, floor) >= floor) return plain
    if (scanSideSegments(plain.queryExecution.sparkPlan).exists(hasCostlyRowWork))
      derive(source.repartition(floor))
    else plain
  }

  /** Maximal Exchange-free subtrees of `p` that reach a leaf — the plan
    * segments that run at SOURCE-GRANTED width (everything above the
    * first exchange runs at shuffle width instead).
    */
  private[graft] def scanSideSegments(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    if (!p.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])) Seq(p)
    else p.children.flatMap(scanSideSegments)

  /** True when a scan-side segment carries per-row work that dwarfs
    * parquet decode (see [[widenPlan]] condition 2).
    */
  private[graft] def hasCostlyRowWork(seg: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    val exprs: Seq[Expression] = seg.collect {
      case pr: org.apache.spark.sql.execution.ProjectExec =>
        pr.projectList: Seq[Expression]
      case f: org.apache.spark.sql.execution.FilterExec => Seq(f.condition)
      case g: org.apache.spark.sql.execution.GenerateExec =>
        Seq(g.generator: Expression)
    }.flatten
    exprs.exists(_.exists {
      case _: RegExpReplace | _: RegExpExtractBase | _: RLike | _: Like => true
      case _: StringSplit | _: Sentences => true
      case _: HigherOrderFunction => true
      case _: ScalaUDF => true
      case _: HashExpression[_] => true
      // graft's own per-row scan kernels (clean_scrub, punct_count, the
      // signature kernels): they replaced regex/hash forms this guard
      // already keyed on — swapping the implementation must not blind it
      case _: graft.expressions.CostlyTextKernel => true
      case _ => false
    })
  }
}
