package graft

import org.apache.spark.sql.functions._

import graft.ingest.JsonSource
import graft.pipeline.CorpusAssembly
import graft.query.QueryEngine
import graft.vector.{Featurizer, VectorStore}

/** Reference-parity end-to-end flow (SURVEY §3 entry points 2+3): ingest
  * CNBC-shaped and Reddit-shaped line-JSON, assemble the unified corpus
  * (union + fill + text assembly, never leaving Spark), embed, persist the
  * vector store, and answer a query — the full path a reference user runs,
  * on reference-shaped fixtures.
  */
class EndToEndSpec extends SparkSpec {

  private lazy val corpusPath = {
    import spark.implicits._
    // CNBC-shaped: lowercase keys (the ones the reference's case-sensitive
    // field list silently dropped — SURVEY §1.4(4))
    Seq(
      """{"url":"u1","title":"Apple shares surge","date":"2024-01-02","content":"Apple stock rallied 5% after record iPhone sales and strong profit growth."}""",
      """{"url":"u2","title":"Tariffs weigh on markets","date":"2024-01-03","content":"New tariffs raised inflation fears. Markets fell as trade risk spread."}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text("/tmp/graft_e2e_cnbc")
    // Reddit-shaped
    Seq(
      """{"Title":"Amazon warehouse expansion megathread","URL":"r1","Upvotes":120,"Comments_Count":45,"Post_Time":"2024-01-02 10:00:00"}""",
      """{"Title":"Is Apple still a buy?","URL":"r2","Upvotes":80,"Comments_Count":30,"Post_Time":"2024-01-03T11:00:00Z"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text("/tmp/graft_e2e_reddit")

    val cnbc = JsonSource("/tmp/graft_e2e_cnbc", Some(core.Schemas.article)).load(spark)
    val reddit = JsonSource("/tmp/graft_e2e_reddit", Some(core.Schemas.redditPost)).load(spark)
      .withColumnRenamed("Title", "title")
    val unified = CorpusAssembly.withDocId(
      CorpusAssembly.assemble(CorpusAssembly.union(Seq(cnbc, reddit))))
    val fz = new Featurizer(dim = 64).fit(unified, "text")
    val embedded = fz.transform(unified, "text")
      .select("doc_id", "text", "embedding")
    VectorStore.save(embedded, "/tmp/graft_e2e_store")
    "/tmp/graft_e2e_store"
  }

  test("corpus assembly keeps all four docs (CNBC not silently dropped)") {
    assert(VectorStore.load(spark, corpusPath).count() == 4)
  }

  test("retrieval + extractive answer over the persisted store") {
    val store = VectorStore.load(spark, corpusPath).cache()
    val fz = new Featurizer(dim = 64).fit(store, "text")
    val engine = new QueryEngine(store, fz)
    val hits = engine.topK("apple shares profit", k = 2).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("text").toLowerCase.contains("apple"))
    val ans = engine.answer("apple profit growth", k = 3, maxSentences = 2)
    assert(ans.toLowerCase.contains("apple") || ans.toLowerCase.contains("profit"))
  }

  test("timestamp dialects in the reddit fixture both parse (SURVEY §7.4(5))") {
    import spark.implicits._
    val reddit = JsonSource("/tmp/graft_e2e_reddit", Some(core.Schemas.redditPost)).load(spark)
    val parsed = reddit.select(functions.CleanFunctions.parseTimestamp($"Post_Time").as("t")).collect()
    assert(parsed.forall(!_.isNullAt(0)))
  }
}
