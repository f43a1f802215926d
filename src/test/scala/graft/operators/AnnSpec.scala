package graft.operators

import graft.SparkSpec

/** ANN correctness: the exact path (Similarity.topK) is the oracle; recall
  * at k=10 must be ≥ 0.9 on seeded clustered data (SURVEY §2.2 verification
  * plan for O33).
  */
class AnnSpec extends SparkSpec {

  // clustered vectors: 8 centers, 40 points each, mild noise
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 4 - 2))
    (0L until 320L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(v => v + rnd.nextFloat() * 0.2f - 0.1f).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  private val query = {
    val rnd = new scala.util.Random(77)
    Array.fill(16)(rnd.nextFloat() * 4 - 2)
  }

  private def recall(approx: Seq[Long], exact: Seq[Long]): Double =
    approx.toSet.intersect(exact.toSet).size.toDouble / exact.size

  test("IVF search recall ≥ 0.9 vs exact cosine top-10") {
    val exact = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    val idx = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8, seed = 42L)
    val approx = Ann.ivfSearch(idx, query, 10, nprobe = 4, Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    assert(recall(approx, exact) >= 0.9, s"approx=$approx exact=$exact")
  }

  test("IVF with nprobe = nlist equals exact search") {
    val exact = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    val idx = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8, seed = 42L)
    val full = Ann.ivfSearch(idx, query, 10, nprobe = 8, Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact)
  }

  test("ivfNearDupJoin finds every planted duplicate and nothing below the floor") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.FloatType
    // plant ×3-scaled copies of the first 20 vectors: identical direction →
    // bit-identical unit vector → same quantizer cell with probability 1
    val planted = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(3.0d)).cast(FloatType)).as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted)
    val pairs = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
        minCos = 0.999, nlist = 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { i =>
      assert(pairs.contains((i, i + 1000L)), s"planted pair $i missing")
    }
    // every returned pair must clear the verification floor in the brute
    // reference path too (engine pairs ⊆ brute pairs at the same floor)
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute), s"non-brute pairs: ${pairs.diff(brute)}")
  }

  test("ivfNearDupJoin auto-sizes nlist and still verifies candidates exactly") {
    val pairs = Ann.ivfNearDupJoin(corpus, "vec_id", "embedding",
      minCos = 0.9999, seed = 7L)
    // clustered-but-noisy corpus: near-identical pairs are rare; whatever
    // is returned must carry a cosine at/above the floor
    assert(pairs.collect().forall(_.getDouble(2) >= 0.9999))
  }

  test("auto-sized near-dup join runs exactly one corpus-cardinality job") {
    // the r15 advice: verifyPairs re-counted a corpus the auto-sizing had
    // already counted — one redundant Spark job per join, real on derived/
    // cached corpora. Exactly TWO `count` actions remain by design: the
    // sizing probe and Materialize.eager's cache-fill count over the
    // (tiny, id-only) candidate set — the latter is a materialization
    // barrier, not a cardinality probe.
    val counts = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (funcName == "count") counts.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Ann.ivfNearDupJoin(corpus, "vec_id", "embedding",
        minCos = 0.9999, seed = 7L).collect()
      // the execution-listener bus is async: wait for the expected events,
      // then a grace beat so an unexpected EXTRA count would also land
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline && counts.get < 2)
        Thread.sleep(50)
      Thread.sleep(300)
      assert(counts.get == 2,
        s"expected 2 count actions (sizing probe + eager barrier), saw ${counts.get}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("LSH top-k recall ≥ 0.9 vs exact L2 top-10") {
    val exact = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.L2)
      .collect().map(_.getLong(0)).toSeq
    val approx = Ann.lshTopK(corpus, "vec_id", "embedding", query, 10,
      bucketLength = 4.0, numHashTables = 8, seed = 42L)
      .collect().map(_.getLong(0)).toSeq
    assert(recall(approx, exact) >= 0.9, s"approx=$approx exact=$exact")
  }
}
