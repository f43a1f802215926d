package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Pins the planted-only-verification harness (`ScaleBench
  * .plantedStraddleRecall`) against the full `Ann.imiNearDupJoin` it
  * stands in for at scale (SCALE.md §past-clamp): the planted recall
  * count must equal the engine join's planted-pair count EXACTLY, at
  * both join shapes. The argument is per-pair verification
  * independence; this gate keeps the two code paths from drifting
  * (the harness mirrors the engine's sample/seeds/kEff/kHalf/margin
  * resolution — any divergence shows up here as a count mismatch).
  */
class ScaleBenchSpec extends SparkSpec {

  /** Deterministic clustered fixture: 8 well-separated anchors in
    * dim 16, 400 vectors jittered around them — enough cell structure
    * that the quantizer fit is non-trivial and the θ≈25° straddle
    * rotation produces both candidate hits and misses.
    */
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val anchors = Array.fill(8, 16)(rnd.nextGaussian() * 4.0)
    val rows = (0 until 400).map { i =>
      val a = anchors(i % 8)
      val v = a.map(x => (x + rnd.nextGaussian() * 0.6).toFloat).toSeq
      (i.toLong, v)
    }
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("vec_id", "embedding").cache()
  }

  private def fullJoinPlanted(margin: Double, mp: Int): Long =
    Ann.imiNearDupJoin(
      ScaleBench.straddlePool(emb, minCos = 0.9), "vec_id", "embedding",
      minCos = 0.9, seed = 42L, probeMargin = margin, maxProbes = mp)
      .filter(col("vb") === col("va") + lit(ScaleBench.plantIdOffset))
      .count()

  test("planted-only recall == full engine join, single-probe shape") {
    val planted = ScaleBench.plantedStraddleRecall(emb, 0, margin = 0.0, mp = 2)
    val full = fullJoinPlanted(margin = 0.0, mp = 2)
    assert(planted == full, s"planted=$planted full=$full")
    // non-vacuity: the fixture must produce both hits and misses —
    // all-pass or all-miss would gate nothing (the round-12 marginal
    // workload lesson)
    assert(planted > 0 && planted < 400, s"degenerate fixture: $planted/400")
  }

  test("planted-only recall == full engine join, multi-probe shape") {
    val planted = ScaleBench.plantedStraddleRecall(emb, 0, margin = 0.05, mp = 2)
    val full = fullJoinPlanted(margin = 0.05, mp = 2)
    assert(planted == full, s"planted=$planted full=$full")
    assert(planted > 0 && planted < 400, s"degenerate fixture: $planted/400")
    // the margin probe must recover strictly more than single-probe on
    // a straddle-heavy fixture, and AUTO must resolve to a valid margin
    val single = ScaleBench.plantedStraddleRecall(emb, 0, margin = 0.0, mp = 2)
    assert(planted >= single, s"mp=$planted < single=$single")
    val auto = ScaleBench.plantedStraddleRecall(emb, 0, margin = -1.0, mp = 2)
    assert(auto == fullJoinPlanted(margin = -1.0, mp = 2))
  }
}
