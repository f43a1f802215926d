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

  test("writePartitioned lays out hive-style dirs and filters prune partitions") {
    import spark.implicits._
    val docs = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "es"), (4L, "d", "de"))
      .toDF("id", "txt", "lang")
    val path = "/tmp/graft_test_sink_partitioned"
    Sinks.writePartitioned(docs, path, Seq("lang"))
    assert(new java.io.File(s"$path/lang=en").isDirectory)
    val filtered = spark.read.parquet(path).filter($"lang" === "en")
    assert(filtered.count() == 2)
    val scan = filtered.queryExecution.executedPlan.toString
    // partition pruning: the lang predicate is a PartitionFilter on the scan
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
  }
}
