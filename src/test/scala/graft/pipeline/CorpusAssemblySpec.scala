package graft.pipeline

import graft.SparkSpec

class CorpusAssemblySpec extends SparkSpec {

  test("union aligns by name with missing columns (O20/O24)") {
    import spark.implicits._
    val cnbc = Seq(("t1", "c1", "u1")).toDF("title", "content", "url")
    val reddit = Seq(("t2", 42)).toDF("Title", "Upvotes")
    // normalize reddit col casing first (realistic pre-step), then union
    val u = CorpusAssembly.union(Seq(cnbc, reddit.withColumnRenamed("Title", "title")))
    assert(u.count() == 2)
    assert(u.columns.toSet == Set("title", "content", "url", "Upvotes"))
  }

  test("assemble matches fields case-insensitively (fixes SURVEY §1.4(4))") {
    import spark.implicits._
    // lowercase keys like the real CNBC JSON that the reference silently dropped
    val df = Seq(("some title", "some content")).toDF("title", "content")
    val out = CorpusAssembly.assemble(df)
    assert(out.select("text").head().getString(0) == "some title some content")
  }

  test("assemble drops rows with empty assembled text") {
    import spark.implicits._
    val df = Seq(("", ""), ("x", "")).toDF("Title", "Content")
    assert(CorpusAssembly.assemble(df).count() == 1)
  }

  test("withDocId is content-addressed and reproducible") {
    import spark.implicits._
    val df = Seq("alpha", "beta").toDF("text")
    val a = CorpusAssembly.withDocId(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = CorpusAssembly.withDocId(df.repartition(4)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // partition-layout independent
  }
}
