package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.SparkSpec

/** Inverted-multi-index near-dup join (Ann.imiNearDupJoin): the composite
  * two-half-quantizer cell must preserve the flat join's contract — exact
  * duplicates found with probability 1, precision exact via the cosine
  * verification kernel — with a pinned recall floor for noisy near-dups
  * next to flat IVF's on the same fixture.
  */
class ImiSpec extends SparkSpec {

  // clustered vectors: 8 centers, 40 points each, mild noise (AnnSpec's
  // fixture shape; 16-dim splits into two 8-dim quantizer halves)
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 4 - 2))
    (0L until 320L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(v => v + rnd.nextFloat() * 0.2f - 0.1f).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  test("imiNearDupJoin finds every planted exact duplicate") {
    // ×3-scaled copies: identical direction → bit-identical unit vector →
    // identical half-vectors → same composite cell with probability 1
    val planted = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(3.0d)).cast(FloatType)).as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted)
    val pairs = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
        minCos = 0.999, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { i =>
      assert(pairs.contains((i, i + 1000L)), s"planted pair $i missing")
    }
    // precision is exact: engine pairs ⊆ brute pairs at the same floor
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute), s"non-brute pairs: ${pairs.diff(brute)}")
  }

  test("imiNearDupJoin recall floor on noisy near-dups, next to flat IVF") {
    // noisy copies (small angular perturbation) of the first 40 vectors:
    // these CAN straddle a quantizer boundary, in either half
    val planted = corpus.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0d) + (rand(5) - lit(0.5d)) * lit(0.02d)).cast(FloatType))
          .as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted).cache()
    val floor = 0.995
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = floor)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    def recallOf(pairs: Set[(Long, Long)]): Double =
      pairs.intersect(brute).size.toDouble / brute.size
    // matched granularity (8 natural clusters): flat 8 cells vs imi 3×3
    // composite cells, so the delta isolates the composite-cell geometry
    // rather than over-partitioning the fixture's cluster structure
    val imi = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(imi.subsetOf(brute) && flat.subsetOf(brute))
    assert(recallOf(flat) >= 0.99, s"flat recall ${recallOf(flat)}")
    assert(recallOf(imi) >= 0.99, s"imi recall ${recallOf(imi)} (flat ${recallOf(flat)})")
  }

  test("ivfNearDupJoin auto-sizing past the fit cap delegates to the multi-index and stays correct") {
    // maxFitPoints=64 → cap = 64/8 = 8 flat cells; auto sizing at n=340
    // wants √340 ≈ 18 > 8, so the flat join MUST delegate to IMI — and
    // the planted-duplicate contract must hold through the switch
    val planted = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(3.0d)).cast(FloatType)).as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted)
    val pairs = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
        minCos = 0.999, seed = 42L, maxFitPoints = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { i =>
      assert(pairs.contains((i, i + 1000L)), s"planted pair $i missing")
    }
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute), s"non-brute pairs: ${pairs.diff(brute)}")
  }

  test("multi-probe: pairs are a superset of single-probe, still brute-exact precision") {
    // noisy near-dups as in the recall-floor fixture, but quantized FINE
    // (nlist=64 on 340 vectors → composite 8×8 cells) so boundary
    // straddles actually occur and multi-probe has pairs to recover
    val planted = corpus.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0d) + (rand(5) - lit(0.5d)) * lit(0.02d)).cast(FloatType))
          .as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted).cache()
    val floor = 0.995
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = floor)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification keeps precision exact in both modes
    assert(single.subsetOf(brute) && multi.subsetOf(brute))
    // the margin-gated probe set only ever ADDS candidate pairs
    assert(single.subsetOf(multi),
      s"single-probe pairs lost under multi-probe: ${single.diff(multi)}")
    // the flat join accepts the same knob through the delegation path
    val flatMulti = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flatMulti.subsetOf(brute))
    pool.unpersist()
  }

  test("autoProbeMargin: anchored at both measured scales, clamped") {
    // the rule reproduces the two measured operating points (SCALE.md
    // §straddle): 0.02 at kHalf=57 (402k pool) and 0.05 at kHalf=125 (2M)
    assert(math.abs(Ann.autoProbeMargin(57) - 0.0228) < 1e-12)
    assert(math.abs(Ann.autoProbeMargin(125) - 0.05) < 1e-12)
    assert(Ann.autoProbeMargin(4) == 0.01)    // floor
    assert(Ann.autoProbeMargin(2048) == 0.1)  // cap
  }

  test("autoMaxProbes: switches 2 -> 3 exactly where the margin clamp binds") {
    // the clamp binds when 4e-4*kHalf > 0.1, i.e. kHalf > 250 (n ~ 8M at
    // the default targetCellPop). Below/at the boundary the AUTO default
    // must stay the historical 2; past it the measured recovery is 3
    // (SCALE.md past-clamp grid: 54-56% recall vs the 42-44% clamped
    // floor for 1.7x the probe rows).
    assert(Ann.autoMaxProbes(57) == 2)   // 402k anchor
    assert(Ann.autoMaxProbes(125) == 2)  // 2M anchor
    assert(Ann.autoMaxProbes(250) == 2)  // last pre-clamp kHalf
    assert(Ann.autoMaxProbes(251) == 3)  // first clamped kHalf
    assert(Ann.autoMaxProbes(354) == 3)  // 16M grid row
    // consistency with the margin rule: AUTO probes rise IFF the margin
    // clamped (the two rules must agree on where "past the clamp" starts)
    for (k <- Seq(57, 125, 250, 251, 307, 354, 2048))
      assert((Ann.autoMaxProbes(k) == 3) == (4e-4 * k > Ann.autoProbeMargin(k)),
        s"autoMaxProbes and autoProbeMargin disagree on the clamp point at kHalf=$k")
  }

  test("AUTO maxProbes under AUTO margin equals explicit maxProbes=2 below the clamp") {
    // below the clamp (tiny kHalf here) the packaged defaults must be
    // bit-identical to the historical explicit (auto margin, 2 probes) —
    // the round-14 default change may only alter behavior past kHalf=250
    val pool = corpus.select("vec_id", "embedding").cache()
    val floor = 0.98
    val auto = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicit = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = -1.0, maxProbes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == explicit)
    pool.unpersist()
  }

  test("probeMargin = -1 (auto) behaves like an explicit margin: superset of " +
      "single-probe, brute-exact precision, both join shapes") {
    val planted = corpus.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0d) + (rand(5) - lit(0.5d)) * lit(0.02d)).cast(FloatType))
          .as("embedding"))
    val pool = corpus.select("vec_id", "embedding").union(planted).cache()
    val floor = 0.995
    val brute = Dedup.cosinePairs(pool, "vec_id", "embedding", minCos = floor)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(brute))
    assert(single.subsetOf(auto),
      s"single-probe pairs lost under auto multi-probe: ${single.diff(auto)}")
    val flatAuto = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
      minCos = floor, nlist = 64, seed = 42L, probeMargin = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flatAuto.subsetOf(brute))
    pool.unpersist()
  }

  test("imiNearDupJoin is deterministic for a fixed seed") {
    def run() = Ann.imiNearDupJoin(corpus, "vec_id", "embedding",
        minCos = 0.98, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }
}
