package graft.query

import graft.SparkSpec
import graft.vector.Featurizer

class QueryEngineSpec extends SparkSpec {

  private lazy val (engine, fz) = {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spark joins merge large tables quickly. Shuffle cost dominates."),
      (2L, "The quick brown fox jumps over the lazy dog."),
      (3L, "Broadcast joins avoid shuffles for small tables. Spark plans them automatically."),
      (4L, "Completely unrelated cooking recipe with butter and flour."))
      .toDF("doc_id", "text")
    val f = new Featurizer(dim = 64).fit(docs, "text")
    val corpus = f.transform(docs, "text").cache()
    (new QueryEngine(corpus, f), f)
  }

  test("topK retrieves join-related docs first") {
    val top = engine.topK("spark joins tables", k = 2).collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 3L))
  }

  test("embed memo returns the identical cached array (O35)") {
    val a = engine.embed("some query")
    val b = engine.embed("some query")
    assert(a eq b) // same instance = cache hit
  }

  test("answer extracts overlapping sentences and is deterministic (O36)") {
    val a1 = engine.answer("spark joins tables", k = 3, maxSentences = 2)
    val a2 = engine.answer("spark joins tables", k = 3, maxSentences = 2)
    assert(a1 == a2)
    assert(a1.toLowerCase.contains("join"))
  }

  test("answer skips redundant near-duplicate sentences (MMR pass)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spark joins merge tables quickly. Spark joins merge tables quickly!"),
      (2L, "Spark joins merge tables quickly. Broadcast avoids the shuffle for joins."))
      .toDF("doc_id", "text")
    val f = new Featurizer(dim = 64).fit(docs, "text")
    val eng = new QueryEngine(f.transform(docs, "text"), f)
    val ans = eng.answer("spark joins tables shuffle", k = 2, maxSentences = 2)
    // the duplicated sentence must appear once; the second slot goes to new info
    assert(ans.toLowerCase.split("spark joins merge tables quickly").length <= 2, ans)
    assert(ans.toLowerCase.contains("broadcast"), ans)
  }

  test("answer falls back gracefully with no overlap") {
    val a = engine.answer("zzzz qqqq xyzzy", k = 2)
    assert(a == "No relevant context found.")
  }

  test("a custom Synthesizer replaces the generation step only") {
    import spark.implicits._
    val docs = Seq((1L, "Spark joins merge tables. Shuffle cost dominates."))
      .toDF("doc_id", "text")
    val f = new graft.vector.Featurizer(dim = 64).fit(docs, "text")
    val corpus = f.transform(docs, "text").cache()
    val probe = new Synthesizer {
      def synthesize(q: String, ranked: Seq[String], max: Int): String =
        s"[$q|${ranked.size} cands]"
    }
    val e = new QueryEngine(corpus, f, synthesizer = probe)
    // retrieval and sentence ranking ran as usual; only composition swapped
    val out = e.answer("spark joins", k = 1, maxSentences = 2)
    assert(out.startsWith("[spark joins|") && out.endsWith(" cands]"), out)
    corpus.unpersist()
  }

  // ------------------------------------------------- volume dispatch
  // a corpus big enough to sit above a forced threshold, with enough
  // lexical structure that queries have meaningful neighbors
  private lazy val (bigCorpus, bigFz) = {
    import spark.implicits._
    val docs = (1 to 600).map { i =>
      (i.toLong,
        s"topic${i % 5} word${i % 7} word${i % 13} term${i % 29} filler${i % 3} tail${i % 11}")
    }.toDF("doc_id", "text")
    val f = new Featurizer(dim = 64).fit(docs, "text")
    (f.transform(docs, "text").cache(), f)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("topK volume-dispatches to the IVF probe past the threshold, recall ≥ 0.9") {
    val idx = graft.operators.Ann.ivfBuild(bigCorpus, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    val dispatched = new QueryEngine(bigCorpus, bigFz,
      annIndex = Some(idx), exactScanMaxRows = 100)
    val exact = new QueryEngine(bigCorpus, bigFz) // default threshold: exact
    val qs = Seq("topic1 word3 term4", "topic2 word5", "term17 filler1 topic4")
    qs.foreach { q =>
      val d = dispatched.topK(q, k = 10)
      // the dispatched plan must actually prune on the cluster column
      assert(d.queryExecution.analyzed.toString.contains("cluster"),
        "dispatched topK did not filter on cluster")
      val overlap = ids(d).toSet.intersect(ids(exact.topK(q, k = 10)).toSet).size
      assert(overlap >= 9, s"recall floor: $overlap/10 for '$q'")
    }
  }

  test("dispatch stays exact below the threshold and for non-cosine metrics") {
    val idx = graft.operators.Ann.ivfBuild(bigCorpus, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    // below threshold: 600 rows <= default ExactScanMaxRows
    val below = new QueryEngine(bigCorpus, bigFz, annIndex = Some(idx))
    assert(!below.topK("topic1 word3", k = 5)
      .queryExecution.analyzed.toString.contains("cluster"))
    // past threshold but L2 metric: the index is cosine-ordered, exact runs
    val forced = new QueryEngine(bigCorpus, bigFz,
      annIndex = Some(idx), exactScanMaxRows = 100)
    assert(!forced.topK("topic1 word3", k = 5, graft.operators.Similarity.L2)
      .queryExecution.analyzed.toString.contains("cluster"))
  }

  test("auto-built index (no caller layout) dispatches and returns k rows") {
    val auto = new QueryEngine(bigCorpus, bigFz, exactScanMaxRows = 100)
    val out = auto.topK("topic3 word2 term11", k = 10)
    assert(out.queryExecution.analyzed.toString.contains("cluster"))
    assert(ids(out).size == 10)
    spark.catalog.clearCache() // release the auto-build's pinned assignment
  }

  test("evaluate heuristics (O37): accuracy/clarity/grounding in [0,1]") {
    val m = engine.evaluate("spark joins", "Spark plans broadcast joins automatically",
      Seq("Broadcast joins avoid shuffles. Spark plans them automatically."))
    assert(m.keySet == Set("accuracy", "clarity", "grounding"))
    m.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(m("accuracy") == 1.0) // both query terms appear in the answer
    assert(m("grounding") > 0.5)
  }
}
