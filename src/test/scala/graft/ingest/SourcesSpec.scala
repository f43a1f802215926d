package graft.ingest

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("fetched runs the fetch on executors and drops failures (O4+O5)") {
    import spark.implicits._
    val out = Sources.fetched[Int, String](spark, 1 to 10,
      i => if (i % 3 == 0) None else Some(s"item$i"))
    assert(out.collect().sorted.toSeq ==
      (1 to 10).filter(_ % 3 != 0).map(i => s"item$i").sorted)
  }

  test("fromSeq builds a typed dataset (O6)") {
    import spark.implicits._
    val ds = Sources.fromSeq(spark, Seq(("a", 1), ("b", 2)))
    assert(ds.count() == 2)
  }

  test("JsonSource reads line-delimited JSON with explicit schema (O2)") {
    import spark.implicits._
    val dir = "/tmp/graft_test_json_src"
    Seq("""{"url":"u1","title":"t1","date":"d1","content":"c1"}""",
        """{"url":"u2","title":"t2","date":"d2","content":"c2"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val df = JsonSource(dir, Some(graft.core.Schemas.article)).load(spark)
    assert(df.columns.toSeq == Seq("url", "title", "date", "content"))
    assert(df.count() == 2)
  }

  test("CsvSource honors quote/escape options (O1)") {
    val path = getClass.getResource("/sec_fixture.csv").getPath
    val df = CsvSource(path, Some(graft.core.Schemas.secRaw)).load(spark)
    assert(df.count() == 7)
    // quoted comma-grouped value survives as one field
    val mv = df.select("Market Value").collect().map(_.getString(0))
    assert(mv.contains("559,365,151.11"))
  }
}
