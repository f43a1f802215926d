package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => TF}
import graft.operators.{Ann, Clusters, Dedup, Similarity}

/** Headline-operator scaling harness (round-6 verdict, next-round item 1):
  * runs the six 100-TB-claim workloads — MinHash+LSH dedup, the composed
  * curation→chunk→split pipeline, the IVF cosine near-dup join, sequence
  * packing, Z-order write, int8-SQ ANN — at FULL table size on a given
  * data dir, so the same command on sf0.1 and the ScaleData-generated sf1
  * yields the wall-time ratio table in SCALE.md. The registered bench
  * queries are unsuitable for this (several pin fixed-subset filters or
  * gate computations sized for the oracle); these are the raw operators
  * at whatever scale the dir holds.
  */
object ScaleBench {

  /** Planted copies land at base id + this offset, so recall counting is a
    * single equi-filter on the join output.
    */
  val plantIdOffset = 1000000000L

  /** How many near-threshold pairs the straddle probes plant. */
  val straddleCount = 2000

  /** Marginal-similarity mega-cluster: the workload that measures the
    * star+chain RECALL contract (round-11 verdict item 1) rather than its
    * cost. Members share a 62-word template — 60 template-internal
    * 3-shingles — plus a per-member unique tail of w ∈ [24,36] words, so
    * pairwise jaccard = 60 / (60 + wi + wj) STRADDLES a 0.5 threshold:
    * a pair verifies iff wi + wj ≤ 60. Width layout:
    *  - most ids: w = 24 + xxhash(id) mod 13 (uniform — the realistic
    *    marginal cluster, where each link passes with probability ~0.5);
    *  - a contiguous block of `blockLen` ids starting at members/2: w=36,
    *    the adversarial case for a consecutive-rank chain window (every
    *    block-internal link sums to 72 > 60, so the chain cannot cross
    *    it; block members verify only against w=24 partners).
    * Ground truth is ONE component over all members: every member pairs
    * at exactly j = 60/120 = 0.5 (or better) with every w=24 member, and
    * w=24 members are ~1/13 of the cluster. Tail words embed the member
    * id, so tails never collide across members or with the template.
    */
  def plantMarginalCluster(
      base: org.apache.spark.sql.DataFrame, members: Int,
      blockLen: Int = 48, sparseConnectors: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    // each template word must be a SINGLE whitespace token: 62 tokens →
    // exactly 60 template-internal 3-shingles, so shared = 60 and pairwise
    // jaccard = 60/(60+wi+wj) genuinely straddles 0.5 (a 3-words-per-entry
    // template would share 184 shingles and every pair would pass — the
    // round-12 measurement was vacuous for exactly that reason)
    val template = (1 to 62).map(i => s"marginaltoken$i").mkString(" ")
    val blockStart = members / 2
    // sparseConnectors: the HARSH regime — 90% of members at w=36 (every
    // high-high link fails: 72 > 60) and 10% at w=24 (the only viable
    // partners; high-low sums to exactly 60 → j = 0.5, passes). Each
    // high-w member verifies against only ~10% of candidates, so a
    // linear candidate generator gets few tries where the all-pairs form
    // gets hundreds — the true stress of the star+chain contract.
    val width =
      if (sparseConnectors)
        when(pmod(xxhash64(col("id"), lit(11)), lit(10)) === 0, lit(24)).otherwise(lit(36))
      else
        when(col("id") >= blockStart && col("id") < blockStart + blockLen, lit(36))
          .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(13)).cast("int") + lit(24))
    val planted = base.sparkSession.range(members.toLong)
      .withColumn("__w", width)
      .select((col("id") + lit(plantIdOffset)).as("doc_id"),
        concat(lit(template + " "),
          array_join(transform(sequence(lit(1), col("__w")),
            k => concat(lit("u"), col("id").cast("string"), lit("w"), k.cast("string"))),
            " ")).as("text"))
    base.select("doc_id", "text").unionByName(planted)
  }

  /** Full measurement record for [[marginalStats]]: `largest` recovered
    * component size (members = perfect), `verifiedPairs` that survived
    * exact-jaccard, `components` and `isolated` member counts.
    */
  final case class MarginalStats(
      largest: Long, verifiedPairs: Long, components: Long, isolated: Long)

  /** Recovered-membership measurement for [[plantMarginalCluster]]:
    * candidates → exact-jaccard verification → connected components,
    * restricted to planted members. Logs the fragmentation breakdown
    * (largest component, component count, isolated members) and returns
    * the full [[MarginalStats]] so callers (DedupSpec's gate) can assert
    * the workload actually straddles — verified pairs well BELOW the
    * all-pairs count — not just that coverage holds.
    */
  def marginalStats(
      base: org.apache.spark.sql.DataFrame, members: Int,
      maxBandPop: Int, chainWidth: Int = 8, label: String = "",
      sparseConnectors: Boolean = false,
      numHashes: Int = 32, bands: Int = 8): MarginalStats = {
    val pool = plantMarginalCluster(base, members, sparseConnectors = sparseConnectors)
    val pairs = Dedup.minhashNearDups(pool, "doc_id", "text",
        n = 3, numHashes = numHashes, bands = bands, minJaccard = 0.5,
        maxBandPop = maxBandPop, chainWidth = chainWidth)
      .filter(col("da") >= plantIdOffset) // da < db, so both ends planted
      .select("da", "db").cache()
    val nPairs = pairs.count()
    if (nPairs == 0) { pairs.unpersist(false); return MarginalStats(0L, 0L, 0L, members.toLong) }
    val cc = Clusters.connectedComponents(pairs)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val largest = sizes.agg(max(col("n"))).head().getLong(0)
    val nComp = sizes.count()
    val inAny = cc.count()
    System.err.println(
      f"[scale] marginal$label members=$members maxBandPop=$maxBandPop " +
        f"chainWidth=$chainWidth numHashes=$numHashes bands=$bands: " +
        f"verified_pairs=$nPairs largest=$largest " +
        f"components=$nComp isolated=${members - inAny} " +
        f"coverage=${largest.toDouble / members}%.4f")
    pairs.unpersist(false)
    MarginalStats(largest, nPairs, nComp, members - inAny)
  }

  /** [[marginalStats]] reduced to the headline value for the timed arms. */
  def marginalCoverage(
      base: org.apache.spark.sql.DataFrame, members: Int,
      maxBandPop: Int, chainWidth: Int = 8, label: String = "",
      sparseConnectors: Boolean = false,
      numHashes: Int = 32, bands: Int = 8): Long =
    marginalStats(base, members, maxBandPop, chainWidth, label,
      sparseConnectors, numHashes, bands).largest

  /** Near-threshold planted pool for the straddle_recall_* probes: the
    * first [[straddleCount]] vectors each get a copy rotated by θ with
    * cosθ ∈ (minCos+0.002, minCos+0.01) — inside the join's acceptance
    * band but within a hair of the boundary — via v' = cosθ·u + sinθ·w
    * with w a seeded, Gram-Schmidt-orthogonalized Gaussian direction, so
    * the planted cosine is EXACT by construction (u·v' = cosθ) up to float
    * round-off, which the +0.002 margin absorbs. θ ≈ 25° displaces the
    * copy far enough to straddle quantizer cells — the adversarial case
    * for the composite two-half-quantizer geometry, where a pair must
    * co-locate in BOTH halves to become a candidate. Driver-side
    * construction is bounded (straddleCount·dim floats).
    */
  private[graft] def straddlePool(
      emb: org.apache.spark.sql.DataFrame, minCos: Double)
      : org.apache.spark.sql.DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select("vec_id", "embedding").orderBy("vec_id")
      .limit(straddleCount).collect()
    val rnd = new scala.util.Random(99)
    val planted = base.toSeq.flatMap { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray.map(_.toDouble)
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm == 0.0) None
      else {
        val u = v.map(_ / norm)
        val g = Array.fill(u.length)(rnd.nextGaussian())
        val gu = u.zip(g).map { case (a, b) => a * b }.sum
        val w = g.zip(u).map { case (b, a) => b - gu * a }
        val wn = math.sqrt(w.map(x => x * x).sum)
        val cosT = minCos + 0.002 + rnd.nextDouble() * 0.008
        val sinT = math.sqrt(1 - cosT * cosT)
        val vp = u.indices.map(i => ((cosT * u(i) + sinT * w(i) / wn) * norm).toFloat)
        Some((id + plantIdOffset, vp))
      }
    }
    emb.select("vec_id", "embedding")
      .union(spark.createDataset(planted).toDF("vec_id", "embedding"))
  }

  /** The straddle-pool IMI geometry shared by the multi-probe profiling/
    * recall arms: [[straddlePool]] + the ENGINE's own quantizer training
    * ([[Ann.imiFit]] — the same method `imiNearDupJoin` calls, so the
    * harness cannot drift from the join it prices) + the engine's margin
    * resolution.
    */
  private case class StraddleGeometry(
      pool: org.apache.spark.sql.DataFrame,
      model: graft.operators.Ann.ImiModel, mEff: Double)

  private def imiStraddleGeometry(
      emb: org.apache.spark.sql.DataFrame, nlistOverride: Int,
      margin: Double): StraddleGeometry = {
    val pool = straddlePool(emb, minCos = 0.9)
    val m = Ann.imiFit(pool, "embedding", nlist = nlistOverride)
    val mEff = if (margin < 0) Ann.autoProbeMargin(m.kHalf) else margin
    StraddleGeometry(pool, m, mEff)
  }

  /** (doc_id, cluster) primary composite-cell assignment over `g`. */
  private def straddlePrimary(g: StraddleGeometry) = {
    val m = g.model
    m.unitized.select(col("vec_id").as("doc_id"),
      (Ann.nearestCentroidExpr(slice(col("__u"), 1, m.h), m.centersLo) * m.kHalf +
        Ann.nearestCentroidExpr(slice(col("__u"), m.h + 1, m.d - m.h), m.centersHi))
        .as("cluster"))
  }

  /** Exploded (doc_id, cluster) margin-gated probe rows over `g`. */
  private def straddleProbes(g: StraddleGeometry, mp: Int) = {
    val m = g.model
    val loF = m.centersLo.map(_.map(_.toFloat)); val hiF = m.centersHi.map(_.map(_.toFloat))
    val loP = graft.expressions.QuantizerExpressions.nearestCentroids(
      slice(col("__u"), 1, m.h), loF, mp, g.mEff)
    val hiP = graft.expressions.QuantizerExpressions.nearestCentroids(
      slice(col("__u"), m.h + 1, m.d - m.h), hiF, mp, g.mEff)
    m.unitized.select(col("vec_id").as("doc_id"),
      explode(flatten(transform(loP, l => transform(hiP, hp => l * lit(m.kHalf) + hp))))
        .as("cluster"))
  }

  /** Planted-straddle recall under planted-only verification: build the
    * candidate geometry via [[imiStraddleGeometry]], filter candidates to
    * the planted (va, va+[[plantIdOffset]]) pairs BEFORE the distinct +
    * cosine verification, verify, count. Per-pair verification is
    * independent of every other pair, so this equals what the full
    * `Ann.imiNearDupJoin` reports for the planted pairs — an equality
    * ScaleBenchSpec pins against the engine join at both join shapes on
    * every CI run (and which was pinned at scale on the same pools:
    * 942==942 mp at 4M, 347==347 single at 16M — SCALE.md §past-clamp).
    * margin = 0 selects the single-probe join shape (primary×primary,
    * a<b), margin ≠ 0 the multi-probe shape (primary×probes,
    * least/greatest); margin < 0 resolves AUTO like the engine.
    */
  private[graft] def plantedStraddleRecall(
      emb: org.apache.spark.sql.DataFrame, nlistOverride: Int,
      margin: Double, mp: Int): Long = {
    import graft.functions.VectorFunctions
    val g = imiStraddleGeometry(emb, nlistOverride, margin)
    // mp ≤ 0 = AUTO, resolved exactly like the engine join (round 14):
    // autoMaxProbes under an AUTO margin, the historical 2 otherwise — so
    // GRAFT_SCALE_MAX_PROBES=0 measures the PACKAGED defaults, not an arm.
    val mpEff =
      if (mp > 0) mp
      else if (margin < 0) Ann.autoMaxProbes(g.model.kHalf)
      else 2
    val primary = straddlePrimary(g).cache()
    val plantedCands =
      if (g.mEff <= 0.0)
        primary.as("a").join(primary.as("b"),
          col("a.cluster") === col("b.cluster") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("va"), col("b.doc_id").as("vb"))
          .filter(col("vb") === col("va") + lit(plantIdOffset))
          .distinct()
      else
        primary.as("a").join(straddleProbes(g, mpEff).as("b"),
          col("a.cluster") === col("b.cluster") && col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("va"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("vb"))
          .filter(col("vb") === col("va") + lit(plantIdOffset))
          .distinct()
    val vecs = g.pool.select(col("vec_id").as("doc_id"), col("embedding").as("__v"))
    val found = plantedCands
      .join(vecs.as("x"), col("va") === col("x.doc_id"))
      .join(vecs.as("y"), col("vb") === col("y.doc_id"))
      .filter(VectorFunctions.cosine(col("x.__v"), col("y.__v")) >= 0.9)
      .count()
    primary.unpersist(false)
    found
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val label = if (args.length > 1) args(1) else dir
    // optional trailing args: run only the named workloads. GRAFT_SCALE_NLIST
    // overrides the IVF join's auto √n quantizer sizing (the SCALE.md
    // assignment-vs-candidate tradeoff experiment).
    val only = args.drop(2).toSet
    val nlistOverride = sys.env.get("GRAFT_SCALE_NLIST").map(_.toInt).getOrElse(0)
    val marginalMembers =
      sys.env.get("GRAFT_SCALE_MARGINAL_MEMBERS").map(_.toInt).getOrElse(10000)
    // chain width for the marginal arms — the knob the sparse-connector
    // regime's bound-attributable coverage gap trades against (SCALE.md:
    // more chain slots per bucket appearance = more verification tries
    // per member where viable partners are rare)
    val marginalChainWidth =
      sys.env.get("GRAFT_SCALE_CHAIN_WIDTH").map(_.toInt).getOrElse(8)
    // LSH geometry for the marginal arms — the knobs the ISOLATION
    // residual trades against (isolation is banding misses, so it moves
    // with bands/rows-per-band, not with the candidate generator)
    val marginalNumHashes =
      sys.env.get("GRAFT_SCALE_NUM_HASHES").map(_.toInt).getOrElse(32)
    val marginalBands =
      sys.env.get("GRAFT_SCALE_BANDS").map(_.toInt).getOrElse(8)
    // master-aware (SPARK_GRAFT_MASTER → local-cluster): the same harness
    // that produced the local[32] scaling table runs the headliners with
    // separate executor JVMs, so the SCALE.md cluster delta measures real
    // closure/shuffle/broadcast serialization on the identical plans.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

    def timed(name: String)(work: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = work
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.err.println(f"[scale] $name%-18s $sec%8.2f s  (result rows: $n)")
      (name, sec, n)
    }

    // one near-dup mega-cluster of templated documents: a shared 60-word
    // template plus a tiny unique tail per member, so members are near-
    // but not exact-duplicates (survive exact dedup; jaccard ≈ 0.9) and
    // most of the cluster saturates the same band bucket in every band —
    // the adversarial case for the band self-join's per-bucket pair
    // generation (round-10 verdict item 1). Generated distributed.
    def plantMegaCluster(base: org.apache.spark.sql.DataFrame, members: Int) = {
      val template = (1 to 60).map(i => s"boilerplate segment token$i").mkString(" ")
      val planted = spark.range(members.toLong)
        .select((col("id") + lit(plantIdOffset)).as("doc_id"),
          concat(lit(template + " unique tail "), col("id").cast("string")).as("text"))
      base.select("doc_id", "text").unionByName(planted)
    }

    val all: Seq[(String, () => Long)] = Seq(
      "minhash_neardups" -> (() =>
        Dedup.minhashNearDups(docs, "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, minJaccard = 0.5).count()),
      // the mega-cluster gate (round-10 verdict item 1): 50k near-identical
      // docs planted into the corpus; the bounded star+chain candidate
      // path must keep wall near the unclustered minhash_neardups run
      // (the unbounded band self-join would generate ~1.25e9 same-bucket
      // candidates from this one cluster before distinct)
      "minhash_mega50k" -> (() =>
        Dedup.minhashNearDups(plantMegaCluster(docs, 50000), "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, minJaccard = 0.5).count()),
      // before/after A/B at a cluster size where the unbounded form still
      // terminates: 5k members -> ~12.5M same-bucket pairs unbounded vs
      // ~(chainWidth+1)*5k bounded. Same plant, only the cap differs.
      "minhash_mega5k" -> (() =>
        Dedup.minhashNearDups(plantMegaCluster(docs, 5000), "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, minJaccard = 0.5).count()),
      "minhash_mega5k_unbounded" -> (() =>
        Dedup.minhashNearDups(plantMegaCluster(docs, 5000), "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, minJaccard = 0.5,
          maxBandPop = Int.MaxValue).count()),
      // the star+chain RECALL measurement (round-11 verdict item 1): a
      // cluster whose pairwise jaccard straddles the 0.5 threshold (see
      // plantMarginalCluster). Result value is the largest recovered
      // component among planted members; the unbounded arm is the
      // LSH-recall ceiling, so bounded-vs-unbounded is the recall cost
      // attributable to the candidate bound itself. Member count via
      // GRAFT_SCALE_MARGINAL_MEMBERS (default 10000; at 10k the
      // unbounded arm runs ~8-11x the bounded wall — SCALE.md's
      // round-13 table).
      "marginal_mega_bounded" -> (() =>
        marginalCoverage(docs, marginalMembers, maxBandPop = 256,
          chainWidth = marginalChainWidth, label = "_bounded",
          numHashes = marginalNumHashes, bands = marginalBands)),
      "marginal_mega_unbounded" -> (() =>
        marginalCoverage(docs, marginalMembers, maxBandPop = Int.MaxValue,
          chainWidth = marginalChainWidth, label = "_unbounded",
          numHashes = marginalNumHashes, bands = marginalBands)),
      // harsh regime: 90% of members mutually fail verification and only
      // 10% are viable connectors (see plantMarginalCluster) — the case
      // where a linear candidate generator gets ~10 viable tries where
      // all-pairs gets hundreds
      "marginal_sparse_bounded" -> (() =>
        marginalCoverage(docs, marginalMembers, maxBandPop = 256,
          chainWidth = marginalChainWidth,
          label = "_sparse_bounded", sparseConnectors = true,
          numHashes = marginalNumHashes, bands = marginalBands)),
      "marginal_sparse_unbounded" -> (() =>
        marginalCoverage(docs, marginalMembers, maxBandPop = Int.MaxValue,
          chainWidth = marginalChainWidth,
          label = "_sparse_unbounded", sparseConnectors = true,
          numHashes = marginalNumHashes, bands = marginalBands)),
      // CC-dominated workload for the chaos harness (round-11 verdict
      // item 3): 64 interleaved chain components over n nodes (edge
      // i → i+64), diameter n/64 — the worst case pointer doubling
      // exists for, so the run spends its whole wall inside multi-round
      // label propagation with live caches, per-round unpersists, and
      // LogicalRDD plan truncation. Result is Σ labels: component r's
      // minimum id is r, so the exact value is (n/64)·Σr = a checksum
      // over every node's final label — any mislabeled node under
      // executor loss shifts it. GRAFT_SCALE_CC_NODES sizes n.
      "cc_chain" -> (() => {
        val n = sys.env.get("GRAFT_SCALE_CC_NODES").map(_.toLong).getOrElse(2000000L)
        val stride = 64L
        val edges = spark.range(n - stride)
          .select(col("id").as("da"), (col("id") + stride).as("db"))
        val cc = Clusters.connectedComponents(edges)
        cc.agg(sum(col("cluster_id"))).head().getLong(0)
      }),
      "curation_pipeline" -> (() => {
        val curated = graft.pipeline.Curation.curate(docs, "doc_id", "text",
          graft.pipeline.Curation.Config(langs = Set("en"), minQuality = 0.5, minTokens = 5))
        val chunks = graft.pipeline.TrainingData
          .chunkText(curated, "doc_id", "text", chunkChars = 200, overlap = 50)
        graft.pipeline.TrainingData.assignSplit(chunks, "doc_id")
          .groupBy("split").agg(count(lit(1)).as("n")).count()
      }),
      // not one of the six timed headliners — a sanity workload whose
      // RESULT (surviving doc count) must scale exactly N× under
      // ScaleData replication, proving the cipher preserved the
      // lang/quality/dedup distributions it claims to
      "curation_count" -> (() =>
        graft.pipeline.Curation.curate(docs, "doc_id", "text",
          graft.pipeline.Curation.Config(langs = Set("en"), minQuality = 0.5, minTokens = 5))
          .count()),
      // profiling sub-workload (not a timed headliner): curate → chunk with
      // the chunk text MATERIALIZED (sum of chunk lengths defeats column
      // pruning), so sf10 deltas attribute curation_pipeline's cost across
      // its stages: curate = curation_count, chunking = this − that,
      // split+agg = pipeline − this. Result value is the chunk count.
      "curation_chunk" -> (() => {
        val curated = graft.pipeline.Curation.curate(docs, "doc_id", "text",
          graft.pipeline.Curation.Config(langs = Set("en"), minQuality = 0.5, minTokens = 5))
        val chunks = graft.pipeline.TrainingData
          .chunkText(curated, "doc_id", "text", chunkChars = 200, overlap = 50)
        chunks.agg(count(lit(1)).as("n"), sum(col("chunk_chars")).as("c"))
          .head().getLong(0)
      }),
      // profiling sub-workload: the keep-predicate signal pass ALONE —
      // count() after filter lets pruning drop every output column, so
      // what executes is exactly one lang+quality+token chain per row
      // (the irreducible admission cost). curation_count − this = the
      // fingerprint chain + exact-dedup shuffle's share of curate.
      "curation_signals" -> (() => {
        val cfg = graft.pipeline.Curation.Config(
          langs = Set("en"), minQuality = 0.5, minTokens = 5)
        graft.pipeline.Curation.filterKeep(
          graft.pipeline.Curation.annotate(docs, "text"), cfg)
          .count()
      }),
      "ivf_neardup_join" -> (() =>
        Ann.ivfNearDupJoin(emb.select("vec_id", "embedding"),
          "vec_id", "embedding", minCos = 0.9, nlist = nlistOverride, seed = 42L).count()),
      // profiling sub-workload (not a timed headliner): just
      // ivf_neardup_join's quantizer-training prefix — count + sample
      // collect + driver-side Lloyd fit — so ivf_neardup_join − ivf_fit
      // attributes the join's run-to-run spread between the one
      // driver-side compute block and the distributed candidate join.
      // Result value is the fitted centroid count (the auto nlist).
      "ivf_fit" -> (() =>
        Ann.ivfFit(emb.select("vec_id", "embedding"), "embedding",
          nlist = nlistOverride, seed = 42L)._2.length.toLong),
      // the inverted-multi-index variant of ivf_neardup_join: same auto
      // cell-count sizing, cells come from two half-space quantizers —
      // the beyond-the-driver-fit-cap scale path (Ann.imiNearDupJoin
      // scaladoc). Comparable by construction with ivf_neardup_join at
      // every scale point.
      "imi_neardup" -> (() =>
        Ann.imiNearDupJoin(emb.select("vec_id", "embedding"),
          "vec_id", "embedding", minCos = 0.9, nlist = nlistOverride,
          seed = 42L).count()),
      // profiling sub-workloads (not timed headliners): CANDIDATE-PAIR
      // volume — sum over cells of pop·(pop−1)/2 — for the flat vs the
      // composite quantizer at this corpus, so the imi-vs-ivf wall-clock
      // delta can be attributed to cell imbalance (IMI's product cells
      // follow the joint half-distribution, not the uniform product of
      // marginals) rather than guessed at. Result value IS the volume.
      "ivf_cand_volume" -> (() => {
        val (unitized, centers) = Ann.ivfFit(
          emb.select("vec_id", "embedding"), "embedding",
          nlist = nlistOverride, seed = 42L)
        unitized.select(Ann.nearestCentroidExpr(col("__u"), centers).as("c"))
          .groupBy("c").agg(count(lit(1)).as("p"))
          .agg(sum(expr("p * (p - 1) div 2"))).head().getLong(0)
      }),
      "imi_cand_volume" -> (() => {
        // raw table, NOT the straddle pool — the recorded volumes (SCALE.md)
        // are base-corpus numbers; geometry comes from the engine's own fit
        val m = Ann.imiFit(emb.select("vec_id", "embedding"), "embedding",
          nlist = nlistOverride)
        m.unitized.select(
            (Ann.nearestCentroidExpr(slice(col("__u"), 1, m.h), m.centersLo) * m.kHalf +
              Ann.nearestCentroidExpr(slice(col("__u"), m.h + 1, m.d - m.h), m.centersHi)).as("c"))
          .groupBy("c").agg(count(lit(1)).as("p"))
          .agg(sum(expr("p * (p - 1) div 2"))).head().getLong(0)
      }),
      // adversarial recall probe at whatever scale the dir holds (round-9
      // verdict item 6: measure the double-boundary recall trade AT the
      // delegation point, not only on ImiSpec's 340-vector fixture).
      // Plants controlled-rotation near-dups with cos JUST above the 0.9
      // join threshold — v' = cosθ·u + sinθ·w with w ⊥ u, so the planted
      // cosine is exact by construction and the displacement (θ ≈ 25°) is
      // large enough to straddle quantizer cells — then counts how many
      // planted pairs each geometry recovers. Result value IS the found
      // count (out of straddleCount); flat-vs-imi delta is the measured
      // boundary-straddle cost. The flat leg pins nlist at the driver-fit
      // cap (2048) — what the flat path would use past delegation — unless
      // GRAFT_SCALE_NLIST overrides.
      "straddle_recall_imi" -> (() => {
        val pool = straddlePool(emb, minCos = 0.9)
        val found = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
          minCos = 0.9, nlist = nlistOverride, seed = 42L)
          .filter(col("vb") === col("va") + lit(plantIdOffset))
          .count()
        found
      }),
      "straddle_recall_flat" -> (() => {
        val pool = straddlePool(emb, minCos = 0.9)
        val flatNlist = if (nlistOverride > 0) nlistOverride else 2048
        val found = Ann.ivfNearDupJoin(pool, "vec_id", "embedding",
          minCos = 0.9, nlist = flatNlist, seed = 42L)
          .filter(col("vb") === col("va") + lit(plantIdOffset))
          .count()
        found
      }),
      // the delegated IMI with margin-gated multi-probe (round-10 verdict
      // item 2): each half assigns to its 2nd-nearest cell too when the
      // distance is within (1+margin)·best, so boundary-straddling pairs
      // become candidates when either endpoint's probe set reaches the
      // other's primary cell. GRAFT_SCALE_PROBE_MARGIN tunes the margin.
      "straddle_recall_imi_mp" -> (() => {
        val margin = sys.env.get("GRAFT_SCALE_PROBE_MARGIN").map(_.toDouble).getOrElse(0.02)
        val mp = sys.env.get("GRAFT_SCALE_MAX_PROBES").map(_.toInt).getOrElse(2)
        val pool = straddlePool(emb, minCos = 0.9)
        val found = Ann.imiNearDupJoin(pool, "vec_id", "embedding",
          minCos = 0.9, nlist = nlistOverride, seed = 42L, probeMargin = margin,
          maxProbes = mp)
          .filter(col("vb") === col("va") + lit(plantIdOffset))
          .count()
        found
      }),
      // profiling: DISTINCT unordered candidate-pair volume of the
      // multi-probe IMI join on the straddle pool — the quantity the
      // ≤1.5×-candidates gate bounds (the single-probe analog is
      // imi_cand_volume's Σ pop·(pop−1)/2, which for multi-probe has no
      // closed form because pairs dedupe across shared probe cells).
      "imi_mp_cand_volume" -> (() => {
        val margin = sys.env.get("GRAFT_SCALE_PROBE_MARGIN").map(_.toDouble).getOrElse(0.02)
        val mp = sys.env.get("GRAFT_SCALE_MAX_PROBES").map(_.toInt).getOrElse(2)
        val g = imiStraddleGeometry(emb, nlistOverride, margin)
        val primary = straddlePrimary(g).cache()
        val probes = straddleProbes(g, mp).cache()
        val v = primary.as("a")
          .join(probes.as("b"),
            col("a.cluster") === col("b.cluster") && col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("va"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("vb"))
          .distinct().count()
        primary.unpersist(false); probes.unpersist(false)
        v
      }),
      // profiling: total probe rows (n + margin-triggered extras) — the
      // boundary fraction is (rows − n)/n, the factor that prices the
      // adaptive scheme against a fixed ×maxProbes² explode
      "imi_mp_probe_rows" -> (() => {
        val margin = sys.env.get("GRAFT_SCALE_PROBE_MARGIN").map(_.toDouble).getOrElse(0.02)
        val mp = sys.env.get("GRAFT_SCALE_MAX_PROBES").map(_.toInt).getOrElse(2)
        val g = imiStraddleGeometry(emb, nlistOverride, margin)
        straddleProbes(g, mp).count()
      }),
      // straddle recall with planted-only verification (see
      // plantedStraddleRecall's scaladoc for the equivalence argument and
      // its CI/scale pins). Why it exists: the full verify join
      // materializes the ENTIRE candidate stream with both vectors
      // attached (~n·275 rows at auto margin), which past n ≈ 8M exceeds
      // a single box's shuffle disk (measured: 16M and 12M auto-margin
      // arms both filled >75 GB and died on ENOSPC) — on a real cluster
      // that shuffle spreads over hundreds of disks, but the recall curve
      // still has to be measured here.
      "straddle_recall_planted" -> (() => {
        val margin = sys.env.get("GRAFT_SCALE_PROBE_MARGIN").map(_.toDouble).getOrElse(0.02)
        val mp = sys.env.get("GRAFT_SCALE_MAX_PROBES").map(_.toInt).getOrElse(2)
        plantedStraddleRecall(emb, nlistOverride, margin, mp)
      }),
      // diagnostic: a content fingerprint of the fitted IMI centers on the
      // straddle pool — run clean vs under chaos kills to attribute any
      // result divergence to the FIT stage (sample nondeterminism) vs the
      // join/verify stages (recovery nondeterminism)
      "imi_fit_hash" -> (() => {
        val pool = straddlePool(emb, minCos = 0.9)
        val m = Ann.imiFit(pool, "embedding", nlist = nlistOverride)
        // 64-bit FNV-1a over every center's raw double bits (both half
        // banks, in order). deepHashCode*31 had ~2^37 effective range and
        // math.abs folded two states onto one value — too weak for a
        // "bit-equal fingerprint" gate. Masked to 63 bits only so the
        // chaos scripts' [0-9]* JSON grep keeps parsing it (a sign-bit
        // mask is the one unavoidable 2→1 fold; 63 bits ≫ enough).
        var h = 0xcbf29ce484222325L
        for (bank <- Seq(m.centersLo, m.centersHi); c <- bank; x <- c) {
          var bits = java.lang.Double.doubleToRawLongBits(x)
          var i = 0
          while (i < 8) {
            h ^= bits & 0xffL; h *= 0x100000001b3L; bits >>>= 8; i += 1
          }
        }
        h & Long.MaxValue
      }),
      "pack_sequences" -> (() => {
        val d = docs.select(col("doc_id"), col("lang"),
          TF.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        graft.pipeline.TrainingData
          .packSequences(d, "doc_id", "lang", "n_tokens", capTokens = 256L).count()
      }),
      "zorder_write" -> (() => {
        // GRAFT_SCALE_ZORDER_OUT points the sink somewhere else — e.g. a
        // tmpfs mount, the disk-I/O-removed control in the I/O-separated
        // scaling methodology (tools/run_zorder_scale.sh). Result value is
        // BYTES written so runs normalize as throughput, not just seconds.
        val out = sys.env.getOrElse("GRAFT_SCALE_ZORDER_OUT", "/tmp/graft_scale_zorder")
        graft.storage.Layout.zorderWrite(lineitem, out,
          "l_orderkey", "l_partkey", bits = 8, files = 16)
        graft.storage.Layout.dataBytes(spark, out)
      }),
      // compute-only control (not a timed headliner): the exact
      // zorder_write plan — scan → Morton value → range shuffle → sort —
      // against the noop sink, so parquet encode + disk write drop out.
      // disk − tmpfs isolates device I/O; tmpfs − compute isolates encode.
      "zorder_compute" -> (() => {
        graft.storage.Layout.zorderFrame(lineitem,
          "l_orderkey", "l_partkey", bits = 8, files = 16)
          .get.write.format("noop").mode("overwrite").save()
        16L
      }),
      "sq_int8_ann" -> (() => {
        val pool = emb.select("vec_id", "embedding")
        val codesPath = "/tmp/graft_scale_codes"
        graft.vector.ScalarQuantizer.encode(pool, "embedding", dim = 64)
          .select("vec_id", "sq").write.mode("overwrite").parquet(codesPath)
        val qv = pool.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
        graft.vector.ScalarQuantizer.search(
          spark.read.parquet(codesPath), pool, "vec_id", "embedding", "sq",
          qv, k = 10, shortlist = 100).count()
      }),
      // sanity workload (graded by its RESULT, not its time): recall@10 of
      // the int8 path vs the exact inner-product top-10 at whatever scale
      // the dir holds — compression quality must not decay as the corpus
      // grows, not just stay fast. Result value IS the overlap (10 = perfect).
      "sq_recall" -> (() => {
        val pool = emb.select("vec_id", "embedding")
        val codesPath = "/tmp/graft_scale_codes_r"
        graft.vector.ScalarQuantizer.encode(pool, "embedding", dim = 64)
          .select("vec_id", "sq").write.mode("overwrite").parquet(codesPath)
        val qv = pool.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
        val ann = graft.vector.ScalarQuantizer.search(
          spark.read.parquet(codesPath), pool, "vec_id", "embedding", "sq",
          qv, k = 10, shortlist = 100)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.topK(pool, "vec_id", "embedding", qv, 10,
          Similarity.InnerProduct)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        ann.intersect(exact).size.toLong
      }),

      // q36/q37 cost decomposition: an embed-the-corpus query is
      // fit (tokenize+TF+IDF doc-frequency agg) → transform (tokenize+TF
      // again, IDF-scale, L2-normalize) → materialize → k-bounded scans.
      // These arms isolate each increment so the tail attribution says
      // which pass to restructure (tokenization runs TWICE in fit+
      // transform — the fitTransform question) instead of guessing.
      "fz_fit" -> (() => {
        new graft.vector.Featurizer(dim = 64).fit(docs, "text")
        docs.count()
      }),
      "fz_fit_transform" -> (() => {
        val fz = new graft.vector.Featurizer(dim = 64).fit(docs, "text")
        fz.transform(docs, "text").count()
      }),
      "fz_fit_mat" -> (() => {
        val fz = new graft.vector.Featurizer(dim = 64).fit(docs, "text")
        graft.operators.Materialize.eager(fz.transform(docs, "text")).count()
      }),
      "fz_exact_q" -> (() => {
        val fz = new graft.vector.Featurizer(dim = 64).fit(docs, "text")
        val corpus = graft.operators.Materialize.eager(fz.transform(docs, "text"))
        val eng = new graft.query.QueryEngine(corpus, fz)
        val t0 = System.nanoTime()
        val n = eng.topK("spark join merge sort table", 5).count()
        System.err.println(f"[scale] fz_exact_q query-only ${(System.nanoTime()-t0)/1e9}%.2f s")
        n
      }),
      // the QueryEngine.AutoBuildAfter cost model, measured: one warm
      // exact scan vs the in-memory auto-build (ivfBuild + pinned
      // assignment) + first probe, both over the same pinned corpus
      "fz_build_vs_scan" -> (() => {
        val fz = new graft.vector.Featurizer(dim = 64)
        val corpus = fz.fitTransform(docs, "text")
        val exactEng = new graft.query.QueryEngine(corpus, fz)
        exactEng.topK("warm up", 5).count() // codegen warm
        val t0 = System.nanoTime()
        exactEng.topK("spark join merge sort table", 5).count()
        val tScan = System.nanoTime()
        val buildEng = new graft.query.QueryEngine(corpus, fz, autoBuildAfter = 0)
        val n = buildEng.topK("spark join merge sort table", 5).count()
        val tBuild = System.nanoTime()
        buildEng.topK("spark join merge sort table index", 5).count()
        val tProbe = System.nanoTime()
        System.err.println(f"[scale] fz_build_vs_scan exact=${(tScan-t0)/1e9}%.2f " +
          f"build+probe=${(tBuild-tScan)/1e9}%.2f probe=${(tProbe-tBuild)/1e9}%.2f s")
        n
      }))
    val selected = all.filter { case (name, _) => only.isEmpty || only.contains(name) }
    // GRAFT_SCALE_WARMUP=1: run each selected workload once UNTIMED first.
    // The headline six-workload protocol keeps cold fresh-JVM numbers (its
    // in-sequence order self-warms); single-workload methodology runs
    // (run_zorder_scale.sh) opt in so ~5 s of codegen/scan warmup doesn't
    // pollute a small-SF base point and flatter the large-SF ratio.
    if (sys.env.contains("GRAFT_SCALE_WARMUP")) selected.foreach { case (name, work) =>
      try { work(); () } catch { case e: Throwable =>
        System.err.println(s"[scale] warmup $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val results = selected.map { case (name, work) => timed(name)(work()) }

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val rows = results.map { case (k, _, n) => "\"" + k + "\":" + n }.mkString("{", ",", "}")
    println(s"""{"label":"$label","dir":"$dir","times":$qs,"rows":$rows}""")
    spark.stop()
  }
}
