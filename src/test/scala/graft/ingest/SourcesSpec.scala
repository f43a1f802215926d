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

  test("OrcSource round-trips Spark's native ORC format") {
    import spark.implicits._
    val dir = "/tmp/graft_test_orc_src"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").orc(dir)
    val df = OrcSource(dir).load(spark)
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("TextSource reads one row per line") {
    import spark.implicits._
    val dir = "/tmp/graft_test_text_src"
    Seq("line one", "line two", "line three").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    assert(TextSource(dir).load(spark).count() == 3)
  }

  test("BinaryFileSource feeds the multimodal layout") {
    val dir = new java.io.File("/tmp/graft_test_bin_src")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "a.img").toPath, "payload-a".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "b.img").toPath, "payload-bb".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath, "nope".getBytes)
    val files = BinaryFileSource(dir.getAbsolutePath, Some("*.img")).load(spark)
    assert(files.count() == 2)
    val mm = graft.multimodal.Multimodal.fromBinaryFiles(files, "image")
    val metas = mm.collect().map(_.getAs[Map[String, String]]("meta"))
    assert(metas.map(_("bytes")).sorted.toSeq == Seq("10", "9"))
    assert(mm.schema("payload").dataType.typeName == "binary")
    // content-addressed ids are stable across re-reads
    val again = graft.multimodal.Multimodal.fromBinaryFiles(
      BinaryFileSource(dir.getAbsolutePath, Some("*.img")).load(spark), "image")
    assert(mm.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("CsvSource honors quote/escape options (O1)") {
    val path = getClass.getResource("/sec_fixture.csv").getPath
    val df = CsvSource(path, Some(graft.core.Schemas.secRaw)).load(spark)
    assert(df.count() == 8)
    // quoted comma-grouped value survives as one field
    val mv = df.select("Market Value").collect().map(_.getString(0))
    assert(mv.contains("559,365,151.11"))
  }
}
