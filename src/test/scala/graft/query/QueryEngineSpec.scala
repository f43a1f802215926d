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

  test("evaluate heuristics (O37): accuracy/clarity/grounding in [0,1]") {
    val m = engine.evaluate("spark joins", "Spark plans broadcast joins automatically",
      Seq("Broadcast joins avoid shuffles. Spark plans them automatically."))
    assert(m.keySet == Set("accuracy", "clarity", "grounding"))
    m.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(m("accuracy") == 1.0) // both query terms appear in the answer
    assert(m("grounding") > 0.5)
  }
}
