package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate per 10-minute window with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = StreamingOps.windowedEventCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 10:10:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("cleanedEvents applies batch column semantics on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val df = in.toDF().toDF("ts", "event_type", "props")
    val q = StreamingOps.cleanedEvents(df)
      .writeStream.format("memory").queryName("cleaned")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(0), "  CLICK ", """{"k": 1}"""))
      q.processAllAvailable()
      val r = spark.table("cleaned").head()
      assert(r.getAs[String]("event_type") == "click")
      assert(r.getAs[String]("props_clean") == "k 1")
    } finally q.stop()
  }

  test("intervalJoin matches the batch interval join on a static drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val l = clicks.toDF().toDF("click_id", "user_id", "click_ts")
    val r = buys.toDF().toDF("buy_id", "buy_user", "buy_ts")
    val q = StreamingOps.intervalJoin(
        l, "click_ts", r, "buy_ts", "user_id", "buy_user",
        span = "10 minutes", watermark = "5 minutes")
      .select("click_id", "buy_id")
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, 7L, ts(0)), (2L, 7L, ts(20)), (3L, 8L, ts(0)))
      buys.addData((10L, 7L, ts(5)), (11L, 7L, ts(25)), (12L, 9L, ts(5)),
        (13L, 8L, ts(11)))
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      // click 1 matches buy 10 (within 10 min, same user); click 2 matches
      // buy 11; click 3 does not match buy 13 (11 min gap) nor buy 12
      // (other user)
      assert(got == Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("intervalJoinLeftOuter: matches emit immediately, null-pad waits for watermark proof") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val l = clicks.toDF().toDF("click_id", "user_id", "click_ts")
    val r = buys.toDF().toDF("buy_id", "buy_user", "buy_ts")
    val q = StreamingOps.intervalJoinLeftOuter(
        l, "click_ts", r, "buy_ts", "user_id", "buy_user",
        span = "10 minutes", watermark = "5 minutes")
      .select("click_id", "buy_id")
      .writeStream.format("memory").queryName("iloj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, 7L, ts(0)), (3L, 8L, ts(0)))
      buys.addData((10L, 7L, ts(5)))
      q.processAllAvailable()
      val matched = spark.table("iloj").collect()
        .map(rr => (rr.getLong(0), rr.get(1))).toSet
      // match emits without waiting; unmatched click 3 must NOT emit yet —
      // watermark hasn't proven its 10-min window closed
      assert(matched == Set((1L, 10L)))
      // advance event time far past click 3's window (+ watermark delay)
      clicks.addData((4L, 9L, ts(60)))
      buys.addData((11L, 9L, ts(61)))
      q.processAllAvailable()
      val after = spark.table("iloj").collect()
        .map(rr => (rr.getLong(0), Option(rr.get(1)))).toSet
      assert(after.contains((3L, None)), s"null-padded row missing: $after")
    } finally q.stop()
  }

  test("thresholdCrossings fires once, at the end of the first crossing batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = StreamingOps.thresholdCrossings(in.toDS(), thresholdCents = 100L)
      .toDF().writeStream.format("memory").queryName("crossings")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 40L), (1L, 30L), (2L, 10L))   // nobody crosses
      q.processAllAvailable()
      assert(spark.table("crossings").count() == 0)
      in.addData((1L, 50L), (2L, 20L))              // user 1 crosses (120)
      q.processAllAvailable()
      val r1 = spark.table("crossings").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(r1.toSeq == Seq((1L, 3L, 120L)))
      in.addData((1L, 500L), (2L, 80L))             // user 1 must NOT re-fire; user 2 crosses (110)
      q.processAllAvailable()
      val r2 = spark.table("crossings").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(r2 == Set((1L, 3L, 120L), (2L, 3L, 110L)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "id", "v")
    val q = StreamingOps.dedupStream(df, Seq("id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, "a"), (ts(1), 1L, "a-dup"), (ts(2), 2L, "b"))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("sessionCounts merges events within the gap into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "user")
    val q = StreamingOps.sessionCounts(df, "ts", "user", gap = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // u1: 10:01,10:03 (one session), 10:30 (new session); u2: 10:02
      in.addData((ts(1), "u1"), (ts(3), "u1"), (ts(30), "u1"), (ts(2), "u2"))
      q.processAllAvailable()
      // append mode emits a session only once the watermark passes its end:
      // push a far-later event to close everything from the first batch
      in.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "u3"))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getString(2), r.getLong(3)))
      assert(rows.count(_._1 == "u1") == 2)       // two closed sessions for u1
      assert(rows.filter(_._1 == "u1").map(_._2).sorted.toSeq == Seq(1L, 2L))
      assert(rows.filter(_._1 == "u2").map(_._2).toSeq == Seq(1L))
      assert(!rows.exists(_._1 == "u3"))          // flush session still open
    } finally q.stop()
  }

  test("runningPerUser keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val q = StreamingOps.runningPerUser(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      in.addData((1L, 2.0))
      q.processAllAvailable()
      val latest = spark.table("running").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest(1L) == ((3L, 17.0)))
      assert(latest(2L) == ((1L, 1.0)))
    } finally q.stop()
  }

  test("transformWithState running totals match mapGroupsWithState across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Long)]
    val q = StreamingOps.runningPerUserCentsTws(in.toDS())
      .writeStream.format("memory").queryName("running_tws")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, 1000L), (1L, 500L), (2L, 100L))
      q.processAllAvailable()
      in.addData((1L, 200L), (3L, 7L))
      q.processAllAvailable()
      val latest = spark.table("running_tws").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest(1L) == ((3L, 1700L)))
      assert(latest(2L) == ((1L, 100L)))
      assert(latest(3L) == ((1L, 7L)))
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
