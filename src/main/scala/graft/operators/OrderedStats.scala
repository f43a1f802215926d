package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact ordered statistics with full parallelism at ANY group cardinality.
  *
  * Spark's built-in `percentile` aggregate buffers every (value, count)
  * pair of a group in executor memory — the one aggregate shape that can
  * OOM at 100-TB group sizes. The window-sort alternative
  * (`row_number().over(partitionBy(group).orderBy(value))`, kept below as
  * [[exactPercentilesBySort]]) is spill-safe but its parallelism is the
  * GROUP CARDINALITY: three l_returnflag values means three tasks
  * total-sorting 1/3 of the table each, at any cluster size — measured
  * 10.7 s at sf1 where the rest of the agg family runs 2-7 s.
  *
  * An exact percentile does not need a total order — only the k-th and
  * k+1-th order statistics. [[exactPercentiles]] finds them by
  * DISTRIBUTED SELECTION, the classic multi-pass refinement:
  *
  *   1. per-group count/min/max (one parallel agg);
  *   2. histogram pass: bucket every row into B=8192 equi-width range
  *      buckets per group; per-(group,bucket) count/min/max (one parallel
  *      agg — the histogram is G·B rows, never collected to the driver);
  *   3. locate each needed rank's bucket via a per-group running sum over
  *      the ≤B bucket rows (a window over the HISTOGRAM, not the data);
  *      a bucket whose min == max resolves immediately (all-duplicate
  *      values — the order statistic IS that value, and the level below
  *      could never split it);
  *   4. if the largest still-needed bucket holds more than `leafRows`
  *      rows, recurse: re-run 2-3 on only those buckets' rows with the
  *      bucket's own [min,max] as the new range (tagged per target, so
  *      the loop state is uniform); the population shrinks ~B× per level
  *      except under value concentration, which step 3's equal-value exit
  *      terminates — double spacing bounds the depth at ~64/13 levels;
  *   5. leaf: row_number over (group, bucket) — partitions of ≤ leafRows
  *      rows — picks the exact in-bucket rank; one tiny agg interpolates.
  *
  * Every pass is a full-width scan or a ≤leafRows-partition window; no
  * stage's parallelism depends on group cardinality. Driver involvement
  * is one scalar per level (max unresolved-bucket population — the
  * recursion decision), never data. Shuffle volume: level 1 moves the
  * G·B histogram, later levels move only needed-bucket rows.
  *
  * Semantics match SQL `percentile_cont` / Spark `percentile` (type-7
  * interpolation at h = (n-1)·p over non-null values; order statistics
  * of a multiset are tie-insensitive, so results are identical to the
  * sort form's). Groups with zero non-null values are omitted (the
  * built-in returns NULL for them — callers needing that row can
  * left-join the group universe). NaN sorts greatest, matching Spark's
  * sort order.
  *
  * Reference behavior: pandas `quantile` in the analytics summary
  * (ai_powered_financial_analysis.py:214-230), exact by construction.
  */
object OrderedStats {

  /** Range buckets per refinement level. 8192 = 13 bits of the double's
    * value range per level; big enough that one level usually suffices,
    * small enough that the G·8192-row histogram stays a cheap shuffle.
    */
  private val Buckets = 8192

  /** Largest bucket population the leaf window sorts. One leaf partition
    * is (group, bucket)-keyed, so this bounds per-task memory, not
    * per-group data.
    */
  private val LeafRows = 65536L

  private val MaxLevels = 12

  /** `__v` when finite, null otherwise — NaN compares false on both
    * bounds, so one range test excludes NaN and ±Inf together (aggregate
    * min/max ignore the nulls).
    */
  private def finiteV =
    when(col("__v") > lit(Double.NegativeInfinity) &&
      col("__v") < lit(Double.PositiveInfinity), col("__v"))

  /** Largest per-group row count the SORT form still handles well: one
    * task external-sorting half a million rows is ~0.2 s, cheaper than
    * selection's three full-width passes. Above it, the sort form's
    * single-task-per-group bound dominates and selection wins (measured:
    * sf0.1 ≈200k rows/group sort 1.8 s vs selection 2.6 s; sf1 2M
    * rows/group sort 10.7 s vs selection 4.9 s).
    */
  private val SortFormMaxGroupRows = 512L * 1024L

  /** Exact interpolated percentiles per group, one (name, p) output
    * column per requested percentile, 0 <= p <= 1. Dispatches on measured
    * per-group volume: the window-sort form below
    * [[SortFormMaxGroupRows]], distributed selection above (pass
    * `selectionThreshold = 0` to force selection — the spec does, to
    * exercise the refinement levels on test-sized data).
    *
    * Caching contract: the sort form persists nothing. The selection form
    * returns an eagerly-cached G-row result (its refinement pins — base
    * agg, per-level candidate rows and open sets — are all released before
    * returning); lifetime of that one small entry follows Materialize
    * .eager's documented contract (harness mains clear the catalog cache
    * per query; long-lived callers release via `spark.catalog
    * .clearCache()`).
    */
  def exactPercentiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)],
      selectionThreshold: Long = SortFormMaxGroupRows): DataFrame = {
    require(ps.nonEmpty, "OrderedStats: at least one percentile required")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"OrderedStats: percentile $n=$p outside [0,1]")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val vals = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast(DoubleType).as("__v"))
    // volume dispatch: below the threshold one task per group sorts
    // comfortably and the sort form's single scan beats selection's three.
    // The probe reads ONLY the group column (its per-group row count is an
    // upper bound on the non-null value count the threshold really means),
    // so the dispatch costs one narrow dictionary/RLE column scan — not the
    // full count/min/max aggregate it used to run and then THROW AWAY
    // whenever it dispatched to the sort form (measured: ~0.6 s of pure
    // probe overhead on the sort path at sf0.1; the narrow probe is ~0.1 s
    // on both paths). The bound is conservative only on high-null-ratio
    // corpora, where it may pick selection for a group the sort form could
    // still handle — a performance choice, never a correctness one (both
    // forms are exact and the sort form is external-sort spill-safe).
    if (selectionThreshold > 0) {
      val maxGroup = df.groupBy(col(groupCol).as("__g"))
        .agg(count(lit(1)).as("__n")).agg(max("__n")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      if (maxGroup <= selectionThreshold)
        return exactPercentilesBySort(df, groupCol, valueCol, ps)
    }
    // Every frame pinned during refinement (base, per-level rows and open
    // sets) is released in the finally below once the final G-row result
    // has been eagerly materialized — the selection path leaves exactly
    // ONE tiny pinned frame behind (the result itself, same lifetime
    // contract as Materialize.eager), instead of accumulating a pin per
    // level across a long-lived session.
    val pins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
    // ONE agg computes count + level-1 range together, eagerly materialized
    // (G rows): targets, the level-1 bucket join, and the final
    // interpolation all reuse it — without the pin, each union branch and
    // join re-executed the full-table agg (measured: ~8 scans of the fact
    // table instead of 3, and on a serially-scanned source that multiplies
    // the one cost selection can't parallelize)
    val base = Materialize.eager(vals.groupBy("__g").agg(
      count(lit(1)).as("__n"),
      min(finiteV).as("__lo"),
      max(finiteV).as("__hi")))
    pins += base
    val counts = base.select("__g", "__n")

    // targets: one row per (group, percentile, lo/hi side) order statistic.
    // __k is the 0-based rank within the group; __tid names the output slot.
    val sides = ps.flatMap { case (name, p) =>
      Seq((s"lo_$name", p, true), (s"hi_$name", p, false))
    }
    val targets0 = sides.map { case (tid, p, isFloor) =>
      val h = (col("__n") - 1).cast(DoubleType) * lit(p)
      val k = (if (isFloor) floor(h) else ceil(h)).cast(LongType)
      counts.select(col("__g"), lit(tid).as("__tid"), k.as("__k"))
    }.reduce(_ union _)

    // Loop state: `rows` (group+tid-tagged candidate rows) and `targets`
    // (rank to find within those rows). Level 1 is untagged (every target
    // of a group shares the full value range), so __tid is null there and
    // the bucket join fans rows out to their targets.
    var rows = vals.withColumn("__tid", lit(null).cast("string"))
    var targets = targets0
    var resolved = Seq.empty[DataFrame]
    var level = 0
    var done = false
    while (!done) {
      level += 1
      require(level <= MaxLevels,
        s"OrderedStats: selection did not converge in $MaxLevels levels")
      val keyed = rows // per-target once tagged; shared (__tid null) at level 1
      val grp: Seq[String] = if (level == 1) Seq("__g") else Seq("__g", "__tid")
      val gcols = grp.map(col)
      // range over FINITE values only: with an infinite __hi or __lo the
      // equi-width ratio below evaluates to NaN (Inf/Inf) or ±Inf, and
      // floor(...).cast(Long) on that throws under ANSI mode (misbuckets
      // with ANSI off). Non-finite values never consult the range — each
      // gets an EXCLUSIVE bucket outside [0, Buckets): -Inf below (-1),
      // +Inf and NaN above (Buckets, Buckets+1 — NaN sorts greatest in
      // Spark, above +Inf). Exclusive matters for termination: an
      // all-{+Inf,NaN} bucket has __bmin ≠ __bmax yet can never be split
      // by a range, so sharing a bucket would recurse forever; alone,
      // each resolves at the next level's equal-value exit. Level 1
      // reuses the pinned base agg; later levels recompute over their
      // (already bounded) rows.
      val stats =
        if (level == 1) base.select("__g", "__lo", "__hi")
        else keyed.groupBy(gcols: _*).agg(
          min(finiteV).as("__lo"), max(finiteV).as("__hi"))
      val b = when(isnan(col("__v")), lit(Buckets + 1L))
        .when(col("__v") === lit(Double.PositiveInfinity), lit(Buckets.toLong))
        .when(col("__v") === lit(Double.NegativeInfinity), lit(-1L))
        .otherwise(when(col("__hi") === col("__lo"), lit(0L)).otherwise(
          least(
            floor((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))
              * lit(Buckets)).cast(LongType),
            lit(Buckets - 1L))))
      val bucketed = keyed.join(stats, grp).withColumn("__b", b)
        .drop("__lo", "__hi")
      val hist = bucketed.groupBy((gcols :+ col("__b")): _*).agg(
        count(lit(1)).as("__c"), min("__v").as("__bmin"), max("__v").as("__bmax"))
      val cum = hist.withColumn("__below",
        sum("__c").over(
          Window.partitionBy(gcols: _*).orderBy("__b")) - col("__c"))
      // locate each target's bucket
      val tj = if (level == 1) targets.join(cum, Seq("__g"))
               else targets.join(cum, Seq("__g", "__tid"))
      val located = tj.filter(
        col("__k") >= col("__below") && col("__k") < col("__below") + col("__c"))
      // equal-value buckets resolve now (and are the only non-splittable case)
      val eq = col("__bmin") === col("__bmax") ||
        (isnan(col("__bmin")) && isnan(col("__bmax")))
      resolved = resolved :+ located.filter(eq)
        .select(col("__g"), col("__tid"), col("__bmin").as("__val"))
      val open = located.filter(!eq)
        .select(col("__g"), col("__tid"), col("__b"),
          (col("__k") - col("__below")).as("__k"), col("__c"))
        .persist()
      pins += open
      val maxPop = open.agg(max("__c")).as[Option[Long]].head().getOrElse(0L)
      if (maxPop == 0L) {
        done = true
      } else if (maxPop <= LeafRows) {
        // leaf: exact in-bucket rank via a window over ≤LeafRows partitions
        val need = open.select(col("__g"), col("__tid").as("__ntid"), col("__b"))
        val joinKeys = if (level == 1) Seq("__g", "__b") else Seq("__g", "__b")
        val cand =
          if (level == 1) bucketed.drop("__tid").join(need, joinKeys)
          else bucketed.join(
            need.withColumnRenamed("__ntid", "__tid"), Seq("__g", "__tid", "__b"))
            .withColumn("__ntid", col("__tid"))
        val ranked = cand.withColumn("__r",
          row_number().over(
            Window.partitionBy(col("__g"), col("__ntid"), col("__b"))
              .orderBy("__v")) - 1)
        val hit = ranked.join(
          open.withColumnRenamed("__tid", "__ntid"), Seq("__g", "__ntid", "__b"))
          .filter(col("__r") === col("__k"))
          .select(col("__g"), col("__ntid").as("__tid"), col("__v").as("__val"))
        resolved = resolved :+ hit
        done = true
      } else {
        // recurse on the oversized buckets only, tagging rows per target so
        // each target refines within its own bucket's range independently
        val need = open.select(col("__g"), col("__tid").as("__ntid"), col("__b"))
        val next =
          if (level == 1) bucketed.drop("__tid").join(need, Seq("__g", "__b"))
            .withColumnRenamed("__ntid", "__tid")
          else bucketed.join(
            need.withColumnRenamed("__ntid", "__tid"), Seq("__g", "__tid", "__b"))
        rows = Materialize.eager(next.select("__g", "__tid", "__v"))
        pins += rows
        targets = open.select("__g", "__tid", "__k")
      }
    }

    val all = resolved.reduce(_ union _)
    // pivot the (group, tid, val) long form back to lo/hi columns and
    // interpolate — one tiny agg over 2·|ps| rows per group
    val aggs = ps.flatMap { case (name, _) =>
      Seq(
        max(when(col("__tid") === s"lo_$name", col("__val"))).as(s"__lo_$name"),
        max(when(col("__tid") === s"hi_$name", col("__val"))).as(s"__hi_$name"))
    }
    val wide = all.groupBy("__g").agg(aggs.head, aggs.tail: _*)
      .join(counts, Seq("__g"))
    val outs = ps.map { case (name, p) =>
      val h = (col("__n") - 1).cast(DoubleType) * lit(p)
      val f = h - floor(h)
      (col(s"__lo_$name") + f * (col(s"__hi_$name") - col(s"__lo_$name")))
        .as(name)
    }
    // materialize the G-row result while the refinement pins are still
    // cached (one pass), so the finally can release them without the
    // caller's consumption recomputing the whole refinement from lineage
    Materialize.eager(wide.select((col("__g").as(groupCol)) +: outs: _*))
    } finally {
      pins.foreach(_.unpersist(blocking = false))
    }
  }

  /** The window-sort form (previous default, kept for the parity spec and
    * for callers that prefer one shuffle over several when the group
    * cardinality already saturates the cluster). Spill-safe — Spark's
    * sort is external, row_number is streaming — but parallelism equals
    * the group cardinality: per-group total order runs one task per
    * group no matter the cluster size.
    */
  def exactPercentilesBySort(
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

  /** Largest per-group row count the plain WINDOW form still handles
    * well: one task external-sorting ≤512k rows stays sub-second, and
    * the window form is ONE shuffle against the distributed form's
    * range-exchange + subtotal agg + broadcast join. Measured on q92's
    * 5-group events table (TimeQuery, both arms one sitting, fresh JVMs,
    * min over 4-5 post-warm iterations — min because co-tenant steal
    * bursts hit individual iterations; full records in SCALE.md r20):
    * sf0.1 ≈20k rows/group window 1.64 s vs distributed 1.98 s; sf1
    * ≈200k rows/group window 5.08 s vs distributed 7.05 s (the ~1.4×
    * the r19 verdict flagged); sf10 ≈2M rows/group window 28.7 s vs
    * distributed 17.6 s — the single-task-per-group sort becomes the
    * whole query, and its gap is unbounded in data-per-group (~1B rows
    * per task a decade up). The break-even sits between 200k and 2M;
    * 512k splits it and matches [[SortFormMaxGroupRows]]'s independently
    * measured sort-task comfort bound. Same dispatch philosophy as
    * there: pick the shape by measured volume, never globally.
    * Overridable via the `graft.rank.windowThreshold` system property
    * (the chaos harness sets 0 to force the distributed machinery under
    * executor kills at chaos-sized data).
    */
  private def WindowFormMaxGroupRows: Long =
    sys.props.get("graft.rank.windowThreshold").map(_.toLong)
      .getOrElse(512L * 1024L)

  /** Distributed per-group row numbers (1-based) + group totals over a
    * TOTAL order — the scale-safe form of
    * `row_number().over(partitionBy(group).orderBy(...))` when the group
    * cardinality is small: the window form runs ONE task per group (a
    * 5-event-type table sorts ~2M rows per task at sf10 and ~1B rows per
    * task a decade up, however many cores the cluster has), while this
    * runs every stage at the configured shuffle width.
    *
    * Volume dispatch (round-20; same precedent as [[exactPercentiles]]'
    * sort-vs-selection choice): the distributed shape only wins once a
    * single group outgrows what one task sorts comfortably — below
    * [[WindowFormMaxGroupRows]] it pays ~1.4× at sf1 for machinery it
    * does not need. A narrow probe (one count-by-group over the group
    * column alone, so the scan prunes to one dictionary/RLE column)
    * measures the max per-group row count and picks the plain window
    * form below the break-even, the distributed form above. Pass
    * `distributedThreshold = 0` to force the distributed form (the spec
    * and the chaos harness do, to exercise the offset machinery on
    * test-sized data); pass a negative value (the default) to use
    * [[WindowFormMaxGroupRows]]. A dispatch miss is a performance
    * choice, never a correctness one — both forms are exact and
    * external-sort spill-safe.
    *
    * Same machinery as TrainingData.packSequences' distributed prefix sum:
    * range-partition by (group, orderCols) — which preserves the total
    * (group, order) sequence ACROSS partitions — then count per
    * (partition, group) (a #partitions × #groups aggregate, small by
    * construction), exclusive-prefix-sum those counts in-plan, and add
    * each partition's offset to a row_number window that only ever sorts
    * WITHIN one range partition (bounded by partition size, not group
    * size). Output = input columns + `rnCol` (1-based rank in the group's
    * order) + `nCol` (group row count).
    *
    * REQUIREMENTS (the caller's contract, both checked nowhere because
    * they are data properties): `orderCols` must be a total order within
    * each group (a unique tiebreaker column makes any order total — with
    * ties, rows equal on the full key straddle range-partition boundaries
    * nondeterministically), and the group column must be non-null (the
    * offset join key is the group cast to string, and packSequences'
    * null-group caveat applies identically). Under a total order,
    * rank() = dense_rank() = row_number(), so the full SQL rank family
    * derives from (rn, n) — see [[ntileFromRn]] and q92.
    *
    * Consistency mechanism (ADVICE r17 restructure): the offsets are no
    * longer collect()ed to the driver under a separate action — they are
    * a window over the (#partitions × #groups)-row subtotal aggregate,
    * derived IN-PLAN from the same pinned `ranged` frame the row_number
    * pass reads and broadcast into the join. One action evaluates both
    * branches, so there is no cross-action window in which a cache clear
    * can split the range boundaries the two passes see. To be precise
    * about what moved where (ADVICE r18): the prefix-sum COMPUTE now runs
    * on executors, but `broadcast(offsetDf)` still materializes its build
    * side on the driver — the driver holds ≤ #partitions × #groups offset
    * ROWS (not the data), subject to Spark's broadcast caps (8 GB / 512M
    * rows) and, without AQE, to `spark.sql.broadcastTimeout` (300 s
    * default) on the first materialization of `ranged`. At the small-G
    * cardinalities this operator targets that table is KBs; a caller with
    * G large enough to strain the broadcast cap should use the window
    * form, whose per-group task is no longer the bottleneck at that
    * width. The pin is still the correctness carrier
    * WITHIN that action (both branches must read the same partition
    * assignment): its lifetime follows Materialize.eager's documented
    * contract — harness mains clear the catalog cache after consuming
    * each query; a long-lived caller should use
    * [[groupedRowNumbersReleasable]] and invoke the returned releaser once
    * the result is consumed (per-call release, no global clearCache
    * needed). Clearing the cache
    * BEFORE consumption recomputes `ranged` from lineage, which is safe
    * exactly when the input's recompute is deterministic
    * (RangePartitioner samples with a fixed per-partition seed, so
    * deterministic input ⇒ identical boundaries) — a caller feeding a
    * nondeterministic upstream must consume before clearing. That
    * residual caveat is inherent to every multi-consumer shuffle
    * boundary, not this operator; the restructure shrank its exposure
    * from "any cache clear between two actions" to "cache clear before
    * first consumption of a nondeterministic input".
    */
  def groupedRowNumbers(
      df: DataFrame, groupCol: String, orderCols: Seq[Column],
      rnCol: String = "rn", nCol: String = "n",
      numPartitions: Int = 0, distributedThreshold: Long = -1L): DataFrame =
    groupedRowNumbersReleasable(df, groupCol, orderCols, rnCol, nCol,
      numPartitions, distributedThreshold)._1

  /** [[groupedRowNumbers]] plus a releaser for its internal pin (ADVICE
    * r18: the convenience form leaks one CacheManager entry per call
    * until a caller-wide `spark.catalog.clearCache()` — fine for the
    * harness mains, which clear after every query, but a long-lived
    * caller invoking this per-batch accumulates cached `ranged` frames
    * indefinitely). The releaser unpersists the pinned range-partitioned
    * frame; call it AFTER the returned frame's result has been consumed
    * (unpersisting earlier recomputes `ranged` from lineage, with the
    * nondeterministic-upstream caveat documented above). Idempotent,
    * non-blocking.
    */
  def groupedRowNumbersReleasable(
      df: DataFrame, groupCol: String, orderCols: Seq[Column],
      rnCol: String = "rn", nCol: String = "n",
      numPartitions: Int = 0,
      distributedThreshold: Long = -1L): (DataFrame, () => Unit) = {
    require(orderCols.nonEmpty, "OrderedStats: an order is required")
    val spark = df.sparkSession
    val threshold =
      if (distributedThreshold < 0) WindowFormMaxGroupRows
      else distributedThreshold
    if (threshold > 0) {
      val maxGroup = df.groupBy(col(groupCol).as("__g"))
        .agg(count(lit(1)).as("__n")).agg(max("__n")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      if (maxGroup <= threshold) {
        // one shuffle, one task per group — fine at this volume, and
        // nothing to pin, so the releaser is a no-op
        val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
        val wn = Window.partitionBy(col(groupCol))
        val out = df
          .withColumn(rnCol, row_number().over(w).cast(LongType))
          .withColumn(nCol, count(lit(1)).over(wn))
        return (out, () => ())
      }
    }
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // persisted (lazily — the consumer's single action populates it via
    // the broadcast subplan, then the probe side reads the cache): the
    // subtotal branch and the row_number branch must see the SAME range
    // boundaries (packSequences' round-9 chaos rationale)
    val ranged = df
      .withColumn("__g", col(groupCol).cast(org.apache.spark.sql.types.StringType))
      .repartitionByRange(parts, (col("__g") +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // exclusive prefix sum of per-(partition, group) counts along the
    // partition order — ≤ parts rows per group, one tiny window task per
    // group over a #partitions × #groups frame. The prefix-sum COMPUTE
    // runs on executors (the old driver collect ran it driver-side), but
    // broadcast() below still materializes these offset rows on the
    // driver as the join's build side — see the doc comment above for
    // the exact bound
    val wOff = Window.partitionBy("__g").orderBy("__pid")
    val wTot = Window.partitionBy("__g")
    val offsetDf = ranged.groupBy("__pid", "__g")
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"), col("__g"),
        (sum("__cnt").over(wOff) - col("__cnt")).as("__off"),
        sum("__cnt").over(wTot).as("__ntot"))
    val w = Window.partitionBy(col("__pid"), col("__g")).orderBy(orderCols: _*)
    val out = ranged
      .join(broadcast(offsetDf), Seq("__pid", "__g"))
      .withColumn(rnCol, col("__off") + row_number().over(w))
      .withColumn(nCol, col("__ntot"))
      .drop("__pid", "__g", "__off", "__ntot")
    (out, () => { ranged.unpersist(blocking = false); () })
  }

  /** SQL `ntile(k)`'s bucket for a (1-based) row number `rn` out of `n`
    * rows: the first n % k buckets carry ⌈n/k⌉ rows, the rest ⌊n/k⌋ —
    * closed-form from (rn, n), no window needed once [[groupedRowNumbers]]
    * has produced a total-order rank. `greatest(q, 1)` keeps the
    * untaken else-branch ANSI-safe when n < k (q = 0: every row lands in
    * the first branch, but CASE still type-checks both arms).
    */
  def ntileFromRn(rn: Column, n: Column, k: Int): Column = {
    // Column./ is Divide (fractional) — integer division must be floor().
    // All operands are row counts ≤ 2^53, exact in the double intermediate.
    def idiv(a: Column, b: Column) = floor(a.cast(DoubleType) / b).cast(LongType)
    val q = idiv(n, lit(k))
    val r = n % k
    val cut = r * (q + 1)
    when(rn <= cut, idiv(rn - 1, q + 1) + 1)
      .otherwise(r + idiv(rn - cut - 1, greatest(q, lit(1L))) + 1)
  }
}
