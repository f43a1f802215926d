package graft.sinks

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
  }

  test("writeSingleJson produces exactly one uncompressed part file (O8)") {
    val path = "/tmp/graft_test_sink_json"
    Sinks.writeSingleJson(df, path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    assert(parts.head.getName.endsWith(".json")) // no compression suffix
  }

  test("writeCsvVerified round-trips count and values (O9/py:296-311)") {
    val back = Sinks.writeCsvVerified(df, "/tmp/graft_test_sink_csv")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("writeParquet is the partitioned scale path (O7 analog)") {
    val path = "/tmp/graft_test_sink_parquet"
    Sinks.writeParquet(df.repartition(3), path)
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
  }
}
