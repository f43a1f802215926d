package graft.operators

import graft.SparkSpec

/** The LSH cosine near-dup path must find what brute force finds (recall)
  * while generating far fewer comparisons than all-pairs.
  */
class CosineLshSpec extends SparkSpec {

  // 30 near-dup pairs (tight noise) + 240 random distractors
  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val base = Array.fill(30)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val dups = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v.toSeq),
        (i.toLong * 2 + 1, v.map(x => x + rnd.nextGaussian().toFloat * 0.05f).toSeq))
    }
    val noise = (1000L until 1240L).map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq))
    (dups.toSeq ++ noise).toDF("vec_id", "embedding").cache()
  }

  test("a dim mismatch fails loudly instead of degenerating to all-pairs") {
    val e = intercept[Exception] {
      Dedup.cosineNearDupsLsh(vecs, "vec_id", "embedding", dim = 64,
        minCos = 0.9, bits = 4, tables = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq() else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("expected 64-dim")), e.getMessage)
  }

  test("LSH pairs recover >= 90% of brute-force pairs at cos >= 0.9") {
    val brute = Dedup.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.cosineNearDupsLsh(vecs, "vec_id", "embedding", dim = 32,
      minCos = 0.9, bits = 10, tables = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute)) // exact verify: no false positives
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall (${lsh.size}/${brute.size})")
  }
}
