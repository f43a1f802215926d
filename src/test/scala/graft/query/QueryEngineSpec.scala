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

  test("topK volume-dispatches to the IVF probe past the threshold, recall ≥ 0.9 per metric") {
    import graft.operators.Similarity
    val idx = graft.operators.Ann.ivfBuild(bigCorpus, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    val dispatched = new QueryEngine(bigCorpus, bigFz,
      annIndex = Some(idx), exactScanMaxRows = 100)
    val exact = new QueryEngine(bigCorpus, bigFz) // default threshold: exact
    val qs = Seq("topic1 word3 term4", "topic2 word5", "term17 filler1 topic4")
    // every supported metric dispatches on this (Featurizer-normalized)
    // corpus: cosine and L2 unconditionally, dot via the unit-norm check
    val metrics = Seq(Similarity.Cosine, Similarity.L2, Similarity.InnerProduct)
    for (m <- metrics; q <- qs) {
      val d = dispatched.topK(q, k = 10, m)
      // the dispatched plan must actually prune on the cluster column
      assert(d.queryExecution.analyzed.toString.contains("cluster"),
        s"dispatched topK did not filter on cluster (metric=$m)")
      val overlap = ids(d).toSet.intersect(ids(exact.topK(q, k = 10, m)).toSet).size
      assert(overlap >= 9, s"recall floor: $overlap/10 for '$q' (metric=$m)")
    }
  }

  test("dispatch stays exact below the threshold and declines unsupported shapes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.FloatType
    import graft.operators.Similarity
    val idx = graft.operators.Ann.ivfBuild(bigCorpus, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    // below threshold: 600 rows <= default ExactScanMaxRows
    val below = new QueryEngine(bigCorpus, bigFz, annIndex = Some(idx))
    assert(!below.topK("topic1 word3", k = 5)
      .queryExecution.analyzed.toString.contains("cluster"))
    // inner product over a NON-unit-norm corpus is a MIPS problem the L2
    // quantizer does not bound — the decline branch must keep the exact
    // full scan (identical results, never a silently-degraded probe)
    val scaled = bigCorpus.select(col("doc_id"), col("text"),
      transform(col("embedding"),
        x => (x * (lit(1.0d) + pmod(col("doc_id"), lit(3L)).cast("double")))
          .cast(FloatType)).as("embedding")).cache()
    val scaledIdx = graft.operators.Ann.ivfBuild(scaled, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    val forced = new QueryEngine(scaled, bigFz,
      annIndex = Some(scaledIdx), exactScanMaxRows = 100)
    val declined = forced.topK("topic1 word3", k = 10, Similarity.InnerProduct)
    assert(!declined.queryExecution.analyzed.toString.contains("cluster"),
      "dot on an unnormalized corpus must not take the IVF probe")
    val exactScaled = new QueryEngine(scaled, bigFz)
    assert(ids(declined) == ids(exactScaled.topK("topic1 word3", k = 10,
      Similarity.InnerProduct)), "declined dispatch must equal the exact scan")
    scaled.unpersist()
  }

  test("auto-built index (no caller layout) dispatches and returns k rows") {
    val auto = new QueryEngine(bigCorpus, bigFz, exactScanMaxRows = 100,
      autoBuildAfter = 0)
    val out = auto.topK("topic3 word2 term11", k = 10)
    assert(out.queryExecution.analyzed.toString.contains("cluster"))
    assert(ids(out).size == 10)
    spark.catalog.clearCache() // release the auto-build's pinned assignment
  }

  test("auto-build defers: exact until the query count justifies the build") {
    import graft.operators.Similarity
    val deferred = new QueryEngine(bigCorpus, bigFz, exactScanMaxRows = 100,
      autoBuildAfter = 2)
    val exact = new QueryEngine(bigCorpus, bigFz) // default threshold: exact
    val qs = Seq("topic1 word3 term4", "topic2 word5", "term17 filler1 topic4")
    // queries 1..autoBuildAfter: no index exists yet — the plan must be the
    // plain scan and the results bit-identical to the sub-threshold engine
    for (q <- qs.take(2)) {
      val d = deferred.topK(q, k = 10)
      assert(!d.queryExecution.analyzed.toString.contains("cluster"),
        s"pre-build query must stay exact: '$q'")
      assert(ids(d) == ids(exact.topK(q, k = 10)),
        s"pre-build query must equal the exact scan: '$q'")
    }
    // query autoBuildAfter+1 triggers the build and probes it
    val post = deferred.topK(qs(2), k = 10)
    assert(post.queryExecution.analyzed.toString.contains("cluster"),
      "post-trigger query must probe the auto-built index")
    val overlap = ids(post).toSet.intersect(ids(exact.topK(qs(2), k = 10)).toSet).size
    assert(overlap >= 9, s"recall floor after deferred build: $overlap/10")
    // a caller-provided layout is NOT deferred — it was paid for elsewhere
    val idx = graft.operators.Ann.ivfBuild(bigCorpus, "doc_id", "embedding",
      nlist = 16, seed = 42L, maxIter = 10)
    val provided = new QueryEngine(bigCorpus, bigFz, annIndex = Some(idx),
      exactScanMaxRows = 100, autoBuildAfter = 1000)
    assert(provided.topK(qs(0), k = 10, Similarity.Cosine)
      .queryExecution.analyzed.toString.contains("cluster"),
      "caller layout must serve from the first query")
    spark.catalog.clearCache() // release the deferred build's pinned assignment
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
