package graft.vector

import graft.SparkSpec

class FeaturizerSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "spark joins merge tables fast"),
      (2L, "the quick brown fox jumps"),
      (3L, "spark tables scan fast columns"),
      (4L, "unrelated words entirely different")).toDF("doc_id", "text")
  }

  test("transform emits fixed-dim float arrays") {
    val fz = new Featurizer(dim = 32).fit(docs, "text")
    val out = fz.transform(docs, "text").select("embedding").collect()
    assert(out.forall(_.getSeq[Float](0).length == 32))
  }

  test("embeddings are L2-normalized") {
    val fz = new Featurizer(dim = 32).fit(docs, "text")
    val norms = fz.transform(docs, "text").select("embedding").collect()
      .map(r => math.sqrt(r.getSeq[Float](0).map(v => v.toDouble * v).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5, s"norm=$n"))
  }

  test("transform is deterministic across invocations") {
    val fz = new Featurizer(dim = 32).fit(docs, "text")
    val a = fz.transform(docs, "text").select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = fz.transform(docs, "text").select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("fitTransform is bit-identical to fit+transform and pins the result") {
    val fz2 = new Featurizer(dim = 32).fit(docs, "text")
    val twoPass = fz2.transform(docs, "text").select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val fz1 = new Featurizer(dim = 32)
    val fused = fz1.fitTransform(docs, "text")
    val onePass = fused.select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(onePass == twoPass)
    // schema contract matches transform (no __ helper columns leak)
    assert(fused.columns.toSet == Set("doc_id", "text", "embedding"))
    // the fused fit must leave the featurizer usable for the driver-side
    // query path with the same weights (the q36 parity contract)
    assert(fz1.embedQuery(spark, "spark tables fast").toSeq ==
      fz2.embedQuery(spark, "spark tables fast").toSeq)
    // the returned frame is pinned (Materialize.eager) — consumers share
    // one computation
    assert(fused.storageLevel.useMemory, "fitTransform result must be persisted")
    // and the intermediate TF frame's pin was released
    fused.unpersist(blocking = true)
  }

  test("embedQuery matches corpus-side embedding of the same text") {
    import spark.implicits._
    val fz = new Featurizer(dim = 32).fit(docs, "text")
    val q = fz.embedQuery(spark, "spark joins merge tables fast")
    val corp = fz.transform(docs, "text").filter($"doc_id" === 1L)
      .select("embedding").head().getSeq[Float](0).toArray
    assert(q.toSeq == corp.toSeq)
  }

  test("similar docs score higher than dissimilar (retrieval sanity)") {
    val fz = new Featurizer(dim = 64).fit(docs, "text")
    val corpus = fz.transform(docs, "text")
    val q = fz.embedQuery(spark, "spark fast tables")
    val ranked = graft.operators.Similarity
      .topK(corpus, "doc_id", "embedding", q, 4, graft.operators.Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    assert(Set(1L, 3L).contains(ranked.head))
    assert(ranked.last == 4L || ranked.last == 2L)
  }

  test("save/load restores a fitted featurizer with identical embeddings") {
    val fz = new Featurizer(dim = 32).fit(docs, "text")
    fz.save("/tmp/graft_test_featurizer")
    val back = Featurizer.load(spark, "/tmp/graft_test_featurizer")
    assert(back.dim == 32)
    val q = "spark tables fast"
    assert(back.embedQuery(spark, q).toSeq == fz.embedQuery(spark, q).toSeq)
    val a = fz.transform(docs, "text").select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = back.transform(docs, "text").select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("VectorStore round-trips the corpus") {
    val fz = new Featurizer(dim = 16).fit(docs, "text")
    val corpus = fz.transform(docs, "text")
    val path = "/tmp/graft_test_vstore"
    VectorStore.save(corpus, path)
    val back = VectorStore.load(spark, path)
    assert(back.count() == 4)
    assert(back.schema.fieldNames.contains("embedding"))
  }
}
