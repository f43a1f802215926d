package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types.StructType

import graft.functions.CleanFunctions

/** Structured Streaming surface (engine extension; the reference's
  * "real-time" ingestion is batch re-runs of the scrape path — SURVEY §2.3 —
  * but a 100-TB training-data pipeline ingests continuously, so the engine
  * exposes its column functions over streams too).
  *
  * Everything composes the same CleanFunctions/TextFunctions columns — a
  * batch-tested operator lifts to streaming unchanged. Watermarks bound
  * state; windowed aggregations and mapGroupsWithState cover the stateful
  * patterns (late-data-tolerant counts, per-key running state).
  */
object StreamingOps {

  /** File-source stream over a directory of parquet drops (the streaming
    * analog of Tables.table; schema must be supplied — streams can't infer).
    */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** The clean stage as a stream transform: same columns as the batch path
    * (O12-O14 semantics lifted to streaming).
    */
  def cleanedEvents(events: DataFrame): DataFrame =
    events
      .withColumn("event_type", CleanFunctions.normalizeKey(col("event_type")))
      .withColumn("props_clean", CleanFunctions.scrub(col("props")))

  /** Watermarked tumbling-window counts per event type. State is bounded by
    * the watermark: rows later than `watermark` past the max seen ts are
    * dropped and their windows finalized — at scale this is what keeps the
    * aggregation state from growing without bound.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      windowLen: String = "10 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming exact dedup: watermark-bounded `dropDuplicates` on the key
    * columns — the streaming face of the batch dedup family. State holds
    * only keys younger than the watermark, so memory is bounded by the
    * key-arrival rate × watermark horizon, not the stream length.
    */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Watermark-windowed key dedup (`dropDuplicatesWithinWatermark`): unlike
    * [[dedupStream]], the key set does NOT include the event time — rows
    * with the same keys arriving within the watermark horizon of each
    * other dedup to the first arrival, and a key's state is dropped once
    * the watermark passes it (the guarantee is "no duplicates within the
    * horizon", which is exactly the at-least-once-source contract: a
    * source retry re-delivers close in time, not days later).
    */
  def dedupWithinWatermark(
      df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner interval join: right-side events inside
    * [left.ts, left.ts + span] per key. Watermarks on BOTH sides are
    * mandatory at scale — Spark derives each side's state-retention
    * horizon from the interval condition plus the watermarks, so join
    * state stays bounded by (arrival rate × (span + watermark)) instead
    * of growing with the stream. Inner-join emission itself does not wait
    * on the watermark, so an availableNow run over a static drop equals
    * the batch join exactly.
    */
  def intervalJoin(
      left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      leftKey: String, rightKey: String, span: String,
      watermark: String): DataFrame = {
    // dataset aliases pin each condition column to its side, so the join
    // builds even when the two streams share key/timestamp column names
    // (the OUTPUT then carries duplicate names — callers selecting from
    // the result of a same-named join should rename before or after)
    val l = left.withWatermark(leftTs, watermark).as("__gl")
    val r = right.withWatermark(rightTs, watermark).as("__gr")
    l.join(r,
      col(s"__gl.$leftKey") === col(s"__gr.$rightKey") &&
        col(s"__gr.$rightTs") >= col(s"__gl.$leftTs") &&
        col(s"__gr.$rightTs") <= col(s"__gl.$leftTs") + expr(s"INTERVAL $span"))
  }

  /** LEFT OUTER interval join: matched pairs emit immediately (as in the
    * inner form); an UNMATCHED left row emits null-padded only once the
    * watermark proves no match can still arrive — i.e. when
    * watermark > left.ts + span. State cost is identical to the inner
    * join; the outer semantics only change eviction-time emission. A
    * terminating (availableNow) run therefore equals the batch LEFT JOIN
    * restricted to left rows whose match window closed before the final
    * watermark (maxEventTime − watermark delay) — unmatched rows at the
    * stream tail are still awaiting proof and correctly do NOT emit.
    */
  def intervalJoinLeftOuter(
      left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      leftKey: String, rightKey: String, span: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("__gl")
    val r = right.withWatermark(rightTs, watermark).as("__gr")
    l.join(r,
      col(s"__gl.$leftKey") === col(s"__gr.$rightKey") &&
        col(s"__gr.$rightTs") >= col(s"__gl.$leftTs") &&
        col(s"__gr.$rightTs") <= col(s"__gl.$leftTs") + expr(s"INTERVAL $span"),
      "left_outer")
  }

  /** Session windows: activity grouped by gaps — events within `gap` of
    * each other merge into one session per key (the sessionization the
    * reference's "real-time" story implies but never implements).
    */
  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String,
      gap: String = "10 minutes", watermark: String = "5 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  final case class UserRunning(user_id: Long, events: Long, total_value: Double)

  final case class UserRunningCents(user_id: Long, events: Long, total_cents: Long)

  /** Exact-integer variant of [[runningPerUser]] for oracle-graded runs:
    * values arrive pre-scaled to integer cents, so the running sum is
    * independent of stream arrival order (double accumulation would drift
    * in the last bits vs a batch-order sum).
    */
  def runningPerUserCents(events: Dataset[(Long, Long)]): Dataset[UserRunningCents] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), UserRunningCents] {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var v = v0
          rows.foreach { case (_, cents) => n += 1; v += cents }
          state.update((n, v))
          UserRunningCents(user, n, v)
      }
  }

  /** [[runningPerUserCents]] on the transformWithState API (the arbitrary-
    * state successor to mapGroupsWithState): named typed state slots from a
    * handle, an explicit OutputMode/TimeMode contract at init, and per-slot
    * TTL. Requires the RocksDB state-store provider — which is also the
    * right provider at scale (HDFS-backed stores keep every key in executor
    * heap; RocksDB spills to local disk and changelogs to the checkpoint).
    */
  final class RunningCentsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserRunningCents] {
    @transient private var totals:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserRunningCents] = {
      val (n0, v0) = Option(totals.get()).getOrElse((0L, 0L))
      var n = n0; var v = v0
      rows.foreach { case (_, cents) => n += 1; v += cents }
      totals.update((n, v))
      Iterator.single(UserRunningCents(user, n, v))
    }
  }

  /** Per-user running totals via [[RunningCentsProcessor]] — semantics
    * identical to [[runningPerUserCents]], exercised as the
    * transformWithState face of the same contract.
    */
  def runningPerUserCentsTws(events: Dataset[(Long, Long)]): Dataset[UserRunningCents] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCentsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  final case class ThresholdCrossing(user_id: Long, events: Long, total_cents: Long)

  /** flatMapGroupsWithState: per-key state that emits ZERO OR MORE rows
    * per batch — here, one row at the end of the FIRST batch where a
    * user's running total reaches `thresholdCents`, nothing before or
    * after (mapGroups must emit exactly one row per key per batch; the
    * flatMap form is the engine's alerting/trigger shape). Emission
    * carries batch-end totals, which are order-independent — firing at
    * the crossing row would expose the nondeterministic within-group
    * arrival order. Append mode; state is (events, cents, alreadyFired),
    * O(1) per key.
    */
  def thresholdCrossings(
      events: Dataset[(Long, Long)], thresholdCents: Long): Dataset[ThresholdCrossing] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Boolean), ThresholdCrossing](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long, Boolean)]) =>
          val (n0, v0, fired0) = state.getOption.getOrElse((0L, 0L, false))
          var n = n0; var v = v0
          rows.foreach { case (_, cents) => n += 1; v += cents }
          val fires = !fired0 && v >= thresholdCents
          state.update((n, v, fired0 || fires))
          if (fires) Iterator.single(ThresholdCrossing(user, n, v))
          else Iterator.empty
      }
  }

  /** Per-user running aggregates via mapGroupsWithState — the custom-state
    * pattern (KeyValueGroupedDataset) for logic windowed aggs can't express.
    * State per key is O(1); partitioning is by group key, so it scales
    * horizontally with the key space.
    */
  def runningPerUser(events: Dataset[(Long, Double)]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserRunning] {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          UserRunning(user, n, v)
      }
  }
}
