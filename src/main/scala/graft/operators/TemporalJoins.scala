package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (the "custom operator"
  * category of the design brief): backward as-of join and bucketed range
  * join. Both are composed from built-in operators (SURVEY §7.3 preference
  * (a)) in shapes that stay shuffle-bounded at scale — no nested-loop
  * fallback, no all-pairs.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the latest right row
    * with `right.ts <= left.ts` within the same key (LEFT semantics: nulls
    * when no prior right row exists). Ties on ts prefer the right row
    * (DuckDB/Pandas ASOF `>=` semantics).
    *
    * Implementation: union both sides tagged, one window per key ordered by
    * (ts, right-first), carry the last non-null right payload forward.
    * Exactly ONE shuffle (the window partitioning) regardless of data size —
    * the naive formulation (per-left-row subquery or range self-join) is
    * quadratic in hot keys. Right rows must be unique per (keys, ts):
    * enforced here by keeping the first by tiebreak ordering.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    // tiebreak for duplicate (keys, ts) right rows; with no payload columns
    // duplicates are identical, any ordering works (but the window must
    // still have an ORDER BY to analyze)
    val tiebreak = if (rightVals.isEmpty) Seq(col(rightTs)) else rightVals.map(col)
    val rightUniq = Dedup.firstRowByKey(
      right.select((keys :+ rightTs) ++ rightVals map col: _*),
      keys :+ rightTs, tiebreak)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__r", lit(0))
      .withColumn("__lrow", struct(leftCols.map(col): _*))
      .withColumn("__rrow", lit(null).cast(
        rightUniq.select(struct((rightTs +: rightVals).map(col): _*)).schema.head.dataType))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__r"), col("__lrow"), col("__rrow"))): _*)
    val r = rightUniq
      .withColumn("__ts", col(rightTs))
      .withColumn("__r", lit(1))
      .withColumn("__lrow", lit(null).cast(
        left.select(struct(leftCols.map(col): _*)).schema.head.dataType))
      .withColumn("__rrow", struct((rightTs +: rightVals).map(col): _*))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__r"), col("__lrow"), col("__rrow"))): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)

    val leftOut = leftCols.map(c => col(s"__lrow.$c").as(c))
    val rightOut = (rightTs +: rightVals).map(c => col(s"__match.$c").as(s"asof_$c"))
    carried.select(leftOut ++ rightOut: _*)
  }

  /** Backward as-of with a max-staleness tolerance (pandas merge_asof's
    * `tolerance`, kdb `wj` windows): a match older than `tolerance` before
    * the left timestamp is nulled out instead of attached. Same single
    * shuffle as [[asofJoin]]; the tolerance is a pure post-filter column
    * map.
    */
  def asofJoinTolerance(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String], tolerance: Column): DataFrame = {
    val joined = asofJoin(left, right, keys, leftTs, rightTs, rightVals)
    val fresh = col(s"asof_$rightTs").isNotNull &&
      col(s"asof_$rightTs") >= col(leftTs) - tolerance
    (rightTs +: rightVals).foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }
  }

  /** Backward as-of join on the CUSTOM PHYSICAL OPERATOR
    * (graft.plans.AsOfJoinExec): same semantics and column layout as
    * [[asofJoin]], but planned as a first-class Catalyst node — each side
    * is clustered on the keys and sorted by (keys, ts) via declared
    * requirements (reused when a side is already bucketed/sorted), then a
    * per-partition two-pointer merge attaches the latest at-or-before
    * right payload with O(1) state. Registered on the session
    * idempotently; cluster deployments get it from
    * `spark.sql.extensions=graft.expressions.GraftExtensions`.
    */
  def asofJoinMerge(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Attribute
    val spark = left.sparkSession
    GraftBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    GraftBridge.addOptimizerRule(spark, graft.plans.PushFilterThroughAsOfJoin)
    val tiebreak = if (rightVals.isEmpty) Seq(col(rightTs)) else rightVals.map(col)
    val rightUniq = Dedup.firstRowByKey(
      right.select((keys :+ rightTs) ++ rightVals map col: _*),
      keys :+ rightTs, tiebreak)
    val lPlan = GraftBridge.analyzed(left)
    val rPlan0 = GraftBridge.analyzed(rightUniq)
    // both sides may derive from the same scan (self-as-of) and then share
    // attribute ids — the analyzer dedups this for Join nodes, but a
    // post-analysis custom node must mint fresh right-side ids itself or
    // downstream binding resolves against the wrong side
    val rPlan =
      if (rPlan0.output.exists(lPlan.outputSet.contains)) {
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.Project
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      } else rPlan0
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${out.map(_.name)}"))
    val payload = (rightTs +: rightVals).map(n => attr(rPlan.output, n))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _)), keys.map(attr(rPlan.output, _)),
      attr(lPlan.output, leftTs), attr(rPlan.output, rightTs),
      payload, graft.plans.AsOfJoinNode.outputAttrs(payload))
    GraftBridge.ofRows(spark, node)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` per key (ties at equal ts match, mirroring the
    * backward form). Same tagged-union single-shuffle design, with the
    * window REVERSED rather than mirrored (round 20): the natural mirror —
    * `first(ignoreNulls)` over (currentRow, unboundedFollowing) on an
    * ascending sort — puts the aggregate on Spark's unbounded-FOLLOWING
    * frame, which cannot evaluate incrementally (rows leave the frame, and
    * aggregates can't un-accumulate), so each output row re-scans forward
    * until the first non-null: O(rows × right-row gap) per partition,
    * degrading with right-side sparsity. Sorting DESCENDING and taking
    * `last(ignoreNulls)` over (unboundedPreceding, currentRow) computes
    * the identical match — the non-null right payload nearest above the
    * current row in descending ts order IS the earliest right row at-or-
    * after it — on the incremental O(rows) frame the backward form already
    * uses. A/B at sf10 (10M events, signups 1/5 of rows — a DENSE right
    * side, so the gap term is only ~5): 5.5-6.7 s reversed vs 6.2-9.3 s
    * following-frame across two sittings, identical output (exceptAll
    * empty both directions); the win grows unboundedly with right-side
    * sparsity. Tie handling: at equal ts the right row (`__r` 1) sorts
    * BEFORE the left row under `__r` DESC, so the equal-ts right payload
    * is inside the left row's preceding frame — same `>=` semantics as
    * the ascending form's left-first-then-following frame.
    */
  def asofJoinForward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val tiebreak = if (rightVals.isEmpty) Seq(col(rightTs)) else rightVals.map(col)
    val rightUniq = Dedup.firstRowByKey(
      right.select((keys :+ rightTs) ++ rightVals map col: _*),
      keys :+ rightTs, tiebreak)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__r", lit(0))
      .withColumn("__lrow", struct(leftCols.map(col): _*))
      .withColumn("__rrow", lit(null).cast(
        rightUniq.select(struct((rightTs +: rightVals).map(col): _*)).schema.head.dataType))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__r"), col("__lrow"), col("__rrow"))): _*)
    val r = rightUniq
      .withColumn("__ts", col(rightTs))
      .withColumn("__r", lit(1))
      .withColumn("__lrow", lit(null).cast(
        left.select(struct(leftCols.map(col): _*)).schema.head.dataType))
      .withColumn("__rrow", struct((rightTs +: rightVals).map(col): _*))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__r"), col("__lrow"), col("__rrow"))): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__r").desc) // right first at equal ts → the tie is in the preceding frame
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)

    val leftOut = leftCols.map(c => col(s"__lrow.$c").as(c))
    val rightOut = (rightTs +: rightVals).map(c => col(s"__match.$c").as(s"asof_$c"))
    carried.select(leftOut ++ rightOut: _*)
  }

  /** Range join: pairs (left, right) with `left.point` inside
    * `[right.start, right.end]`. A plain BETWEEN join falls back to a
    * nested-loop in Spark; bucketing time into `bucket`-sized chunks and
    * exploding each interval over the chunks it spans turns it into an
    * equi-join on the chunk id, with the BETWEEN as a residual filter.
    * Shuffle cost is (rows × interval-span/bucket), tunable via `bucket`.
    */
  def rangeJoin(
      left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    val lb = left.withColumn("__chunk",
      floor(unix_micros(col(pointCol).cast("timestamp")) / bucketMicros))
    val rb = right.withColumn("__chunk", explode(sequence(
      floor(unix_micros(col(startCol).cast("timestamp")) / bucketMicros),
      floor(unix_micros(col(endCol).cast("timestamp")) / bucketMicros))))
    lb.join(rb,
      lb("__chunk") === rb("__chunk")
        && col(pointCol) >= col(startCol)
        && col(pointCol) <= col(endCol))
      .drop("__chunk")
  }
}
