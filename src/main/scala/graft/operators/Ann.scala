package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.vector.KMeansLite

/** Approximate nearest neighbor search — the scale path over the exact
  * `Similarity.topK` oracle (SURVEY.md §2.1 O33; the reference's FAISS
  * IVFFlat with nlist=100, reference ai_powered_financial_analysis.py:730-737).
  *
  * Two implementations:
  *  - LSH (random hyperplane buckets via spark.ml BucketedRandomProjectionLSH)
  *    — index-free, good for L2;
  *  - IVF (KMeans coarse quantizer + nprobe cluster pruning) — the direct
  *    Spark-native analog of the reference's IVFFlat: the corpus is
  *    partitioned by centroid id, and a query only scans the nprobe nearest
  *    clusters, pruning (nlist - nprobe)/nlist of the data. On a real
  *    cluster the corpus is written partitioned by `cluster` so the probe
  *    is a partition-pruned scan, not a filter over everything.
  */
object Ann {

  // ---------------------------------------------------------------- IVF

  final case class IvfIndex(
      assigned: DataFrame,             // corpus + `cluster` column
      centers: Array[Array[Double]],   // driver-side centroids (nlist × dim)
      idCol: String, vecCol: String)

  /** Nearest-centroid id (0-based, first-index tie-break) as ONE codegen'd
    * kernel carrying the centroid bank as a single reference object
    * (graft.expressions.NearestCentroid). A least+when-chain over per-
    * centroid distance columns would inline nlist × dim float literals
    * into the generated Java — seconds of Janino compile per distinct
    * plan — and duplicate every distance subtree. The whole assignment
    * pass stays inside whole-stage codegen: no UDF, no VectorUDT, no
    * shuffle, k·d flops per row.
    */
  def nearestCentroidExpr(vec: Column, centers: Array[Array[Double]]): Column =
    graft.expressions.QuantizerExpressions.nearestCentroid(
      vec, centers.map(_.map(_.toFloat)))

  /** Build the IVF index: train a seeded coarse quantizer on a bounded
    * collected sample (driver-side Lloyd — FAISS practice: centroid quality
    * needs ~256·nlist representative points, not the corpus, and a
    * distributed iterative fit pays a Spark job per Lloyd round), then
    * assign every vector to its centroid in ONE codegen'd map pass.
    * Deterministic for a fixed seed. At cluster scale the assigned corpus
    * is written partitioned by `cluster`, making the probe a
    * partition-pruned scan.
    */
  def ivfBuild(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 100, seed: Long = 42L, maxIter: Int = 20,
      fitSample: Double = 1.0, maxFitPoints: Int = 1 << 16): IvfIndex = {
    val sample = KMeansLite.sampleVectors(corpus, vecCol, fitSample, maxFitPoints, seed)
    // round the trained centroids to float precision ONCE: assignment
    // (float kernel bank) and probe ranking (driver-side doubles) must see
    // the same centroid geometry, or a boundary vector can be assigned to
    // a cell the probe ranking orders differently — a silent recall leak
    val centers = KMeansLite.fit(sample, nlist, maxIter, seed)
      .map(_.map(v => v.toFloat.toDouble))
    val assigned = corpus.withColumn("cluster", nearestCentroidExpr(col(vecCol), centers))
    IvfIndex(assigned, centers, idCol, vecCol)
  }

  /** Cluster ids ranked by centroid L2 distance to the query (driver-side:
    * nlist is small). The prefix of this ranking is the probe set.
    */
  def rankClusters(centers: Array[Array[Double]], query: Array[Float]): Array[Int] = {
    val qd = query.map(_.toDouble)
    def l2sq(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - qd(i); s += d * d; i += 1 }
      s
    }
    centers.zipWithIndex.sortBy { case (c, i) => (l2sq(c), i) }.map(_._2)
  }

  /** IVF search: rank clusters by centroid distance on the driver (nlist is
    * small), then run exact top-k inside the nprobe nearest clusters only.
    */
  def ivfSearch(
      index: IvfIndex, query: Array[Float], k: Int,
      nprobe: Int = 8, metric: Similarity.Metric = Similarity.Cosine): DataFrame = {
    val probes = rankClusters(index.centers, query).take(nprobe)
    val pruned = index.assigned.filter(col("cluster").isin(probes: _*))
    Similarity.topK(pruned, index.idCol, index.vecCol, query, k, metric)
  }

  // ---------------------------------------------------------------- LSH

  /** LSH-bucketed approximate top-k via spark.ml's random-projection LSH.
    * `approxNearestNeighbors` prunes to colliding hash buckets before
    * computing exact distances. Euclidean metric only (the library's).
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      bucketLength: Double = 2.0, numHashTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol).cast(ArrayType(DoubleType))))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("__v").setOutputCol("__h")
    val model = lsh.fit(withVec)
    val qv = org.apache.spark.ml.linalg.Vectors.dense(query.map(_.toDouble))
    model.approxNearestNeighbors(withVec, qv, k)
      .select(col(idCol), col("distCol").as("score"))
  }

  // ------------------------------------------------------- ANN join (IVF)

  /** IVF-bucketed cosine near-dup JOIN — the ANN-join scale path for
    * embedding near-duplicate detection, complementing the hyperplane-LSH
    * path (Dedup.cosineNearDupsLsh): vectors are L2-normalized and
    * assigned to a spherical coarse quantizer (scaled or near-identical
    * directions produce bit-identical unit vectors, so exact duplicates
    * land in the same cell with probability 1), candidate pairs are the
    * same-cell pairs — quadratic only within a cell, linear across cells —
    * and candidates are verified with the exact cosine kernel. Only
    * (id, cluster) flows through the candidate self-join; vectors join
    * back by id for verification, so the corpus is never amplified
    * through the shuffle. At cluster scale the assigned corpus is written
    * partitioned by `cluster` (cf. the q67 partition-pruned probe) and
    * each cell's pair generation is a co-located scan.
    *
    * Recall trade (same one FAISS IVF makes): near-dup pairs straddling a
    * Voronoi boundary are missed; callers needing guarantees for
    * non-identical pairs raise `nlist` granularity or fall back to the
    * multi-table LSH path.
    *
    * `nlist <= 0` sizes the quantizer automatically and SCALE-AWARE.
    * FAISS's √n guidance optimizes single-query probe cost, but for a
    * JOIN the per-candidate cost (shuffle + exact verify) outweighs the
    * per-assignment cost (n·nlist·dim flops), so √n — which lets cell
    * population grow as √n and candidate volume as n^1.5 — goes
    * super-linear at scale (measured: 88.7× wall at 100× data, SCALE.md).
    * The default therefore also bounds the expected cell population at
    * `targetCellPop`: nlist = max(√n, n/targetCellPop), which keeps
    * candidate volume ~n·targetCellPop (linear) once n exceeds
    * targetCellPop², while small corpora keep the √n behavior the
    * q84/q35-scale recall gates pin. When the auto size exceeds
    * maxFitPoints/8 — the most cells a driver-side Lloyd fit on a
    * bounded sample can train with ≥8 points each — the join delegates
    * to [[imiNearDupJoin]], whose composite cells realize the same
    * effective count from two bounded half-fits, so the DEFAULT path
    * keeps bounded cell population at any corpus size.
    */
  /** `probeMargin > 0` turns on margin-gated MULTI-PROBE candidate
    * generation (the FAISS-nprobe analog for joins): one side of the
    * candidate join is assigned to up to `maxProbes` nearest cells —
    * but an extra cell only when its distance is within
    * d_best·(1+probeMargin), so interior vectors (the vast majority)
    * stay single-probe and candidate volume grows by the boundary
    * fraction, not ×maxProbes. Boundary-straddling near-dup pairs — the
    * measured recall gap of the cell-collision scheme (SCALE.md
    * §straddle) — are recovered when either endpoint's probe set
    * reaches the other's primary cell. `probeMargin = 0` (default) is
    * bit-identical to the single-probe join.
    *
    * Measured operating point (SCALE.md §straddle, 402k vectors at the
    * delegation scale): `probeMargin = 0.02` lifts the delegated IMI's
    * worst-case boundary-straddle recall from 26.2% to 40.1% — ABOVE
    * capped-flat's 38.6% — at 1.09× capped-flat's candidate volume and
    * ~1.06× its wall, i.e. the multi-probe composite geometry matches
    * the flat quantizer's adversarial recall while keeping the bounded
    * cell population that scales past the driver-fit cap. The margin is
    * deliberately small: in high dimension nearest-cell distances
    * concentrate, so even 0.1 fires the second probe on ~70% of vectors
    * (measured 3.05 probe rows/vector → 5× candidate volume).
    * `probeMargin < 0` selects the margin AUTOMATICALLY and scale-aware
    * — see [[autoProbeMargin]]: on the delegated IMI branch it widens
    * with the per-half cell count so the straddle-recall floor holds as
    * corpora grow; on the flat branch it resolves to the fixed 0.02
    * reference point (flat fineness is delegation-bounded).
    */
  def ivfNearDupJoin(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double,
      nlist: Int = 0, seed: Long = 42L, maxIter: Int = 10,
      maxFitPoints: Int = 1 << 14, targetCellPop: Int = 128,
      probeMargin: Double = 0.0, maxProbes: Int = 0): DataFrame = {
    // auto-sizing past the driver-fit cap delegates to the inverted
    // multi-index: the flat quantizer cannot add cells beyond
    // maxFitPoints/8, so past n ≈ targetCellPop·(maxFitPoints/8) cell
    // population — and with it candidate volume — would resume growing
    // with n. The composite quantizer realizes the SAME effective cell
    // count from two bounded half-fits (measured faster already at
    // sf10, SCALE.md). An explicit nlist always keeps the flat
    // single-boundary geometry; below the cap the auto path is
    // bit-identical to the pre-delegation code (same k, same fit).
    // the one cardinality job of the auto path — remembered and threaded
    // through to the verify tail's broadcast dispatch (r15 advice: the
    // tail re-counted the corpus, a redundant job per join on derived/
    // cached corpora)
    var knownRows: Option[Long] = None
    val k =
      if (nlist > 0) nlist
      else {
        val nRows = corpus.count()
        knownRows = Some(nRows)
        val n = nRows.toDouble
        val auto = math.max(16, math.max(math.sqrt(n), n / targetCellPop).toInt)
        if (auto > maxFitPoints / 8)
          return imiNearDupJoin(corpus, idCol, vecCol, minCos, auto,
            targetCellPop, seed, maxIter, maxFitPoints, probeMargin, maxProbes,
            knownRows)
        auto
      }
    val (unitized, centers) =
      ivfFit(corpus, vecCol, k, seed, maxIter, maxFitPoints, targetCellPop)
    val assigned = unitized.select(col(idCol).as("doc_id"),
      nearestCentroidExpr(col("__u"), centers).as("cluster"))
    // probeMargin < 0 = AUTO. On the FLAT branch the resolution is the
    // fixed 0.02 reference point: flat fineness is bounded (delegation
    // caps nlist at maxFitPoints/8), so the recall decay the IMI rule
    // compensates for cannot occur here and the 402k-measured operating
    // point applies at every scale this branch serves.
    val margin = if (probeMargin < 0) 0.02 else probeMargin
    // maxProbes ≤ 0 = AUTO. The flat branch is fineness-bounded (the
    // clamp can never bind here), so AUTO is always the historical 2;
    // the default exists so the DELEGATED path above inherits the IMI
    // join's past-clamp auto-raise instead of pinning 2 through it.
    val mpEff = if (maxProbes > 0) maxProbes else 2
    val dim = if (centers.nonEmpty) centers(0).length else 0
    if (margin <= 0.0)
      verifyCellMates(corpus, idCol, vecCol, minCos, assigned, knownRows, dim)
    else {
      val probes = unitized.select(col(idCol).as("doc_id"),
        explode(graft.expressions.QuantizerExpressions.nearestCentroids(
          col("__u"), centers.map(_.map(_.toFloat)), mpEff, margin)).as("cluster"))
      verifyCellMatesProbed(corpus, idCol, vecCol, minCos, assigned, probes,
        knownRows, dim)
    }
  }

  /** Shared tail of the cell-bucketed near-dup joins: same-cell candidate
    * pairs, exact-cosine verification. `assigned` is (doc_id, cluster).
    */
  private def verifyCellMates(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double,
      assignedPlan: DataFrame, knownRows: Option[Long], dim: Int): DataFrame = {
    // cached: the assignment subtree (scan + normalize + k·dim kernel)
    // otherwise re-executes for EACH side of the self-join — callers on a
    // long-lived session release it with catalog.clearCache (Bench/Verify
    // do so per query)
    val assigned = assignedPlan.cache()
    // candidate pairs are materialized eagerly (ids only — tiny next to the
    // vectors), which lets the assignment cache be released before this
    // function returns instead of leaking into the caller's session.
    // Materialize.eager keeps lineage so a lost block recomputes (via a
    // re-derived assignment — deterministic given the fixed centers)
    // instead of failing the query on executor death (round-9 chaos
    // finding: this exact site killed q84 under SIGKILL)
    val cands = Materialize.eager(assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("va"), col("b.doc_id").as("vb")))
    assigned.unpersist(false)
    verifyPairs(corpus, idCol, vecCol, minCos, cands, knownRows, dim)
  }

  /** Multi-probe variant of [[verifyCellMates]]: the candidate join pairs
    * the single-cell `primaryPlan` assignment against the exploded
    * `probePlan` (doc_id, cluster) — up to maxProbes rows per doc — so a
    * pair is a candidate when EITHER endpoint's probe set reaches the
    * other's primary cell. Pairs can be generated from both directions
    * and from several shared cells, hence the distinct() before
    * verification (the single-probe path's a.doc_id < b.doc_id trick
    * cannot dedupe here because the probe relation is asymmetric).
    */
  private def verifyCellMatesProbed(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double,
      primaryPlan: DataFrame, probePlan: DataFrame,
      knownRows: Option[Long], dim: Int): DataFrame = {
    val primary = primaryPlan.cache()
    val probe = probePlan.cache()
    val cands = Materialize.eager(primary.as("a")
      .join(probe.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("va"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("vb"))
      .distinct())
    primary.unpersist(false)
    probe.unpersist(false)
    verifyPairs(corpus, idCol, vecCol, minCos, cands, knownRows, dim)
  }

  /** Largest vector-table SIZE the verification tail broadcasts. Bounded
    * in BYTES, not rows (r15 advice): a row bound sized for 64-float
    * vectors reaches ~6× the intended broadcast at the Featurizer's 384
    * dims — an un-sized driver collect. The threshold itself is MEASURED,
    * and it is much lower than "what fits": round-16 same-box quiet-JVM
    * A/Bs (TimeQuery pairs, SCALE.md round 16) read broadcast FASTER at
    * sf1 (20k × 64f ≈ 5.6 MB: q84 3.2-3.5 s vs 4.6-4.7 shuffled, q179
    * 2.7 vs 4.2) but SLOWER at sf10 (200k × 64f ≈ 56 MB: q84 43-49 s vs
    * 36-39, q179 23-26 vs 16.5-17) — the r15 record that broadcast-
    * dispatched sf10 was taken under attribution load and did not
    * reproduce clean, so the r15 "broadcast below 512k rows" operating
    * point is REVERTED by this bound. 16 MiB sits on the measured-win
    * side of the bracket; larger vector tables take the sort-merge
    * joins, which the sf10 pair shows are the faster shape well before
    * driver memory becomes the binding constraint.
    */
  private val MaxBroadcastVecBytes = 16L << 20

  /** Shared verification tail: join the candidate (va, vb) pairs back to
    * their vectors by id and keep exact-cosine matches. Volume dispatch:
    * vectors broadcast when `rows × (4·dim + 24)` (float payload + id and
    * per-row array overhead) fits [[MaxBroadcastVecBytes]] — the pair
    * side is larger by construction — shuffle joins above. `knownRows`
    * is the corpus cardinality the caller already computed (the auto-
    * sizing paths count once per join); only an explicit-nlist caller,
    * which never counted, pays the one count job here.
    */
  private def verifyPairs(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double,
      cands: DataFrame, knownRows: Option[Long], dim: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val vecs0 = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("__v"))
    val rows = knownRows.getOrElse(corpus.count())
    val vecs =
      if (rows * (4L * dim + 24L) <= MaxBroadcastVecBytes) broadcast(vecs0)
      else vecs0
    cands
      .join(vecs.as("x"), col("va") === col("x.doc_id"))
      .join(vecs.as("y"), col("vb") === col("y.doc_id"))
      .select(col("va"), col("vb"),
        VectorFunctions.cosine(col("x.__v"), col("y.__v")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Inverted-multi-index near-dup join — the same-cell candidate/verify
    * scheme of [[ivfNearDupJoin]], with the composite cell id coming from
    * TWO half-space quantizers instead of one full-space quantizer
    * (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012 — the
    * standard answer to coarse quantizers outgrowing their training
    * budget; FAISS exposes it as IndexIVF over an IMI coarse level).
    *
    * Why it exists: ivfNearDupJoin's scale-aware auto-nlist keeps cell
    * population — and with it candidate volume — bounded at
    * `targetCellPop`, but its nlist is capped at maxFitPoints/8 = 2048
    * because the quantizer is trained by a driver-side Lloyd fit on a
    * bounded sample. Past n ≈ targetCellPop·2048 ≈ 262k vectors the flat
    * quantizer can no longer add cells and population growth resumes.
    * Here the cell id is (c_lo · kHalf + c_hi) from independently-fit
    * kHalf-centroid quantizers over the two vector halves: kHalf²
    * effective cells from two fits that each cost what ONE flat fit
    * costs. kHalf ≤ 2048 pushes the bounded-population regime out to
    * n ≈ targetCellPop·2048² ≈ 5·10⁸ vectors with unchanged driver work
    * — at 100 TB the quantizer training is still a bounded-sample
    * driver job, and assignment is still one codegen'd map pass (two
    * k·(d/2) kernels ≈ the one k·d kernel it replaces).
    *
    * Recall trade vs flat IVF: a near-dup pair must co-locate in BOTH
    * half-quantizers, so boundary-straddle misses roughly double; exact
    * duplicates still collide with probability 1 (identical vectors →
    * identical halves). The ImiSpec recall gate pins the floor next to
    * the flat join's on the same clustered fixture, and the trade is
    * MEASURED at the delegation scale (ScaleBench straddle_recall_*,
    * SCALE.md): on 2,000 planted worst-case straddlers (cos within 0.01
    * of the 0.9 threshold, θ ≈ 25°) in a 400k pool, the delegated IMI
    * recovers 523 vs capped-flat's 771 (0.68×; misses ×1.20 — inside
    * the doubling bound) at 1.8× less wall.
    */
  /** Scale-aware multi-probe margin (round-12, SCALE.md §straddle): the
    * fixed margin's straddle recall DECAYS with cell fineness — 0.02
    * recovers 40.1% at kHalf=57 (402k vectors) but 31.6% at kHalf=125
    * (2M) — because a fixed-θ displacement crosses more, relatively
    * tighter cell boundaries as cells refine, so the margin must widen
    * with the per-half cell count to keep the probed shell at constant
    * PHYSICAL width. margin = 4e-4·kHalf is anchored at kHalf = 57
    * (402k vectors, 43.1% straddle recall) and kHalf = 125 (2M, 42.6%)
    * and VALIDATED OFF-ANCHOR at kHalf = 177 (4M, margin 0.0708:
    * 42.6% again, where single-probe has decayed to 19.0%) — the floor
    * is measured flat across a decade of n. The cost is not flat:
    * holding it grows the candidate volume ~2× per decade over
    * single-probe (2.19× at 402k → 4.27× at 4M; SCALE.md §off-anchor).
    * Clamped to [0.01, 0.1]: below 0.01 the probe adds nothing
    * measurable; above 0.1 the boundary fraction explodes (3.05 probe
    * rows/vector measured at 0.1 even at 402k). The clamp binds at
    * kHalf = 250 (n ≈ 8M at default targetCellPop), and the past-clamp
    * region is MEASURED (SCALE.md §past-clamp, 12M/16M pools): the
    * clamped point sits 2.0-2.3 recall points under the unclamped rule
    * line while pinning probe rows at ~3.04/vector (the unclamped rule
    * keeps growing), and `maxProbes = 3` at the clamped margin recovers
    * recall to ABOVE the two-probe floor (56.4%/54.1% vs the 42-44%
    * floor) for 1.7× the probe rows — so past n ≈ 8M, keep AUTO margin
    * and raise maxProbes rather than the margin.
    */
  def autoProbeMargin(kHalf: Int): Double =
    math.min(0.1, math.max(0.01, 4e-4 * kHalf))

  /** AUTO maxProbes, the clamp's companion (SCALE.md §past-clamp): once
    * the unclamped margin rule 4e-4·kHalf exceeds [[autoProbeMargin]]'s
    * 0.1 clamp — kHalf > 250, n ≈ 8M at the default targetCellPop — the
    * margin can no longer widen and straddle recall sits 2.0-2.3 points
    * under the rule line. The MEASURED recovery (8M/12M/16M pools) is
    * maxProbes = 3 at the clamped margin: 54-56 % recall vs the 42-44 %
    * two-probe floor for 1.7× the probe rows (5.2 vs 3.05 rows/vector,
    * still scale-invariant). Before round 14 that guidance lived only in
    * SCALE.md prose — a 12M-vector user taking the defaults silently ate
    * the clamp decay; this packages it as the AUTO-mode default.
    */
  def autoMaxProbes(kHalf: Int): Int = if (4e-4 * kHalf > 0.1) 3 else 2

  /** The fitted IMI composite quantizer: the unit-normalized frame (with
    * `__u`), the per-half cell count, dims, and the two half-space center
    * banks (carrying the engine's float32 round-trip). `rows` is the
    * corpus cardinality IF the fit had to count it for auto-sizing (or the
    * caller already knew it) — threaded to the verify tail so the join
    * never runs a second count job.
    */
  case class ImiModel(
      unitized: DataFrame, kHalf: Int, d: Int, h: Int,
      centersLo: Array[Array[Double]], centersHi: Array[Array[Double]],
      rows: Option[Long] = None)

  /** The quantizer-training prefix of [[imiNearDupJoin]] — the IMI analog
    * of [[ivfFit]]: auto-kEff sizing (corpus count), unit-normalization,
    * ONE bounded sample collect, two seeded half-space Lloyd fits.
    * Factored out for the same reason ivfFit was, plus one more: the
    * ScaleBench straddle harness (probe-volume and planted-recall arms)
    * builds its candidate geometry from this exact method, so the
    * measurements in SCALE.md §past-clamp price the geometry the join
    * actually plans — one implementation, no drift.
    */
  def imiFit(
      corpus: DataFrame, vecCol: String,
      nlist: Int = 0, targetCellPop: Int = 128, seed: Long = 42L,
      maxIter: Int = 10, maxFitPoints: Int = 1 << 14,
      knownRows: Option[Long] = None): ImiModel = {
    import graft.functions.VectorFunctions
    // effective COMPOSITE cell count: explicit `nlist`, else sized exactly
    // like ivfNearDupJoin's auto-nlist, then split √-wise across the two
    // half-space quantizers. A count already known to the caller (the
    // delegating flat join counted once) is reused, never re-run.
    var rows: Option[Long] = knownRows
    val kEff =
      if (nlist > 0) nlist
      else {
        val nRows = rows.getOrElse { val c = corpus.count(); rows = Some(c); c }
        val n = nRows.toDouble
        math.max(16, math.max(math.sqrt(n), n / targetCellPop).toInt)
      }
    val kHalf = math.min(
      math.max(4, math.ceil(math.sqrt(kEff.toDouble)).toInt), maxFitPoints / 8)
    val unitized = corpus
      .withColumn("__n", sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))))
      .filter(col("__n") > 0.0)
      .withColumn("__u",
        transform(col(vecCol), x => (x.cast(DoubleType) / col("__n")).cast(FloatType)))
    val sample = KMeansLite.sampleVectors(unitized, "__u", 1.0, maxFitPoints, seed)
    val d = sample(0).length
    require(d >= 2, s"imiFit: dim=$d cannot be split into halves")
    val h = d / 2
    // both halves fit from the ONE collected sample; distinct seeds so the
    // two k-means++ streams are independent
    val centersLo = KMeansLite.fit(sample.map(_.take(h)), kHalf, maxIter, seed)
      .map(_.map(v => v.toFloat.toDouble))
    val centersHi = KMeansLite.fit(sample.map(_.drop(h)), kHalf, maxIter, seed + 1)
      .map(_.map(v => v.toFloat.toDouble))
    ImiModel(unitized, kHalf, d, h, centersLo, centersHi, rows)
  }

  def imiNearDupJoin(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double,
      nlist: Int = 0, targetCellPop: Int = 128, seed: Long = 42L,
      maxIter: Int = 10, maxFitPoints: Int = 1 << 14,
      probeMargin: Double = 0.0, maxProbes: Int = 0,
      knownRows: Option[Long] = None): DataFrame = {
    val m = imiFit(corpus, vecCol, nlist, targetCellPop, seed, maxIter,
      maxFitPoints, knownRows)
    val ImiModel(unitized, kHalf, d, h, centersLo, centersHi, mRows) = m
    val assigned = unitized.select(col(idCol).as("doc_id"),
      (nearestCentroidExpr(slice(col("__u"), 1, h), centersLo) * kHalf +
        nearestCentroidExpr(slice(col("__u"), h + 1, d - h), centersHi))
        .as("cluster"))
    // probeMargin < 0 = AUTO: widen with the fitted cell fineness so the
    // straddle-recall floor holds as the corpus grows (see autoProbeMargin)
    val margin = if (probeMargin < 0) autoProbeMargin(kHalf) else probeMargin
    // maxProbes ≤ 0 = AUTO: 2 probes per half normally; 3 once AUTO margin
    // hits its clamp (kHalf > 250 — see autoMaxProbes). Explicit margins
    // keep the historical 2 so a caller pinning the margin isn't surprised
    // by a probe-count change underneath it.
    val mpEff =
      if (maxProbes > 0) maxProbes
      else if (probeMargin < 0) autoMaxProbes(kHalf)
      else 2
    if (margin <= 0.0)
      verifyCellMates(corpus, idCol, vecCol, minCos, assigned, mRows, d)
    else {
      // composite multi-probe: the margin-gated probe lists of the two
      // halves cross-multiply into composite cell ids — for a vector near
      // a boundary in ONE half that's 2 probes, near both corners 4, and
      // for the interior majority exactly 1 (its primary cell). This is
      // the join-shaped cousin of IMI's multi-sequence probe ordering:
      // the margin gate plays the role of the priority queue's distance
      // cutoff, selecting the same near-best composite cells without a
      // per-row queue. The tiny transform/flatten lambdas run interpreted
      // but over ≤maxProbes² elements — negligible next to the two
      // codegen'd half-space scans that feed them.
      val loP = graft.expressions.QuantizerExpressions.nearestCentroids(
        slice(col("__u"), 1, h), centersLo.map(_.map(_.toFloat)), mpEff, margin)
      val hiP = graft.expressions.QuantizerExpressions.nearestCentroids(
        slice(col("__u"), h + 1, d - h), centersHi.map(_.map(_.toFloat)), mpEff, margin)
      val probes = unitized.select(col(idCol).as("doc_id"),
        explode(flatten(transform(loP, lo => transform(hiP, hi => lo * lit(kHalf) + hi))))
          .as("cluster"))
      verifyCellMatesProbed(corpus, idCol, vecCol, minCos, assigned, probes,
        mRows, d)
    }
  }

  /** The quantizer-training prefix of [[ivfNearDupJoin]] — auto-nlist
    * sizing (corpus count), unit-normalization, bounded sample collect,
    * seeded Lloyd fit — returning the normalized frame and the fitted
    * centroids. Factored out so ScaleBench's `ivf_fit` sub-workload can
    * attribute the join's wall-clock between this driver-side stage and
    * the distributed candidate join; behavior is bit-identical to the
    * previously-inline code (same op order, same float round-trip).
    */
  def ivfFit(
      corpus: DataFrame, vecCol: String,
      nlist: Int = 0, seed: Long = 42L, maxIter: Int = 10,
      maxFitPoints: Int = 1 << 14, targetCellPop: Int = 128)
      : (DataFrame, Array[Array[Double]]) = {
    import graft.functions.VectorFunctions
    val k =
      if (nlist > 0) nlist
      else {
        val n = corpus.count().toDouble
        val auto = math.max(math.sqrt(n), n / targetCellPop).toInt
        math.min(math.max(16, auto), maxFitPoints / 8)
      }
    // __n is materialized as its own column so the per-element lambda only
    // reads an attribute (an interpreted HOF re-evaluates non-lambda
    // subtrees per element — a norm recompute per element would be O(dim²))
    val unitized = corpus
      .withColumn("__n", sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))))
      .filter(col("__n") > 0.0)
      .withColumn("__u",
        transform(col(vecCol), x => (x.cast(DoubleType) / col("__n")).cast(FloatType)))
    val sample = KMeansLite.sampleVectors(unitized, "__u", 1.0, maxFitPoints, seed)
    val centers = KMeansLite.fit(sample, k, maxIter, seed)
      .map(_.map(v => v.toFloat.toDouble))
    (unitized, centers)
  }
}
