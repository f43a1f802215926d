package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions
import graft.operators.Similarity
import graft.vector.TextEmbedder

/** The generation seam — the reference's FLAN-T5 `text2text-generation`
  * step (reference ai_powered_financial_analysis.py:446-487) reduced to
  * its contract: overlap-ranked context sentences in, answer string out.
  * The zero-egress default composes extractively; a real generator (local
  * ONNX seq2seq, a serving endpoint) implements the same method and every
  * retrieval/grading path upstream is untouched.
  */
trait Synthesizer extends Serializable {
  /** `ranked`: candidate sentences best-first (already query-relevant). */
  def synthesize(query: String, ranked: Seq[String], maxSentences: Int): String
}

/** Deterministic extractive synthesis: greedy MMR-style pick over the
  * ranked candidates — a candidate that mostly repeats already-selected
  * sentences is skipped in favor of new information.
  */
object ExtractiveSynthesizer extends Synthesizer {
  private def terms(s: String): Set[String] =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").split("\\s+").filter(_.nonEmpty).toSet

  def synthesize(query: String, ranked: Seq[String], maxSentences: Int): String = {
    val picked = ranked.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.size >= maxSentences) acc
      else {
        val st = terms(s)
        val redundant = st.nonEmpty && acc.exists { p =>
          val pt = terms(p)
          st.intersect(pt).size.toDouble / st.size > 0.8
        }
        if (redundant) acc else acc :+ s
      }
    }
    if (picked.isEmpty) "No relevant context found." else picked.mkString(". ") + "."
  }
}

/** Retrieval + extractive answering (SURVEY.md §2.1 O31-O32, O35-O37, §3.3).
  *
  * The reference's RAG path is: embed query → FAISS top-k → 1000-char
  * context → FLAN-T5 generate (reference ai_powered_financial_analysis.py:
  * 446-487), entirely single-process driver code. Here retrieval is a Spark
  * job over the corpus DataFrame (distance expression + TakeOrderedAndProject)
  * and generation is replaced by a deterministic extractive answerer
  * (zero-egress: no LLM weights) — top-k docs, sentence-split, rank
  * sentences by query-term overlap. The interface stays pluggable so a real
  * generator can replace `answer`'s last step.
  */
final class QueryEngine(
    corpus: DataFrame,          // (id, text, embedding) — VectorStore layout
    featurizer: TextEmbedder,
    idCol: String = "doc_id",
    textCol: String = "text",
    vecCol: String = "embedding",
    memoSize: Int = 1000,
    synthesizer: Synthesizer = ExtractiveSynthesizer,
    // serving processes pass their persisted cluster-partitioned layout
    // here (ServingBench does); None auto-builds in-memory past the
    // dispatch threshold
    annIndex: Option[graft.operators.Ann.IvfIndex] = None,
    exactScanMaxRows: Long = QueryEngine.ExactScanMaxRows,
    // how many dispatched queries run on the exact scan before the
    // in-memory auto-build triggers — see [[QueryEngine.AutoBuildAfter]];
    // a caller-provided `annIndex` is used from the first query
    autoBuildAfter: Int = QueryEngine.AutoBuildAfter) extends Serializable {

  private val spark: SparkSession = corpus.sparkSession

  /** O35 — LRU query-embedding memo (the reference's `@lru_cache(1000)`,
    * py:677-679). Driver-side by nature: query strings arrive on the driver.
    */
  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, Array[Float]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Float]]): Boolean =
        size() > memoSize
    }

  def embed(query: String): Array[Float] = memo.synchronized {
    val cached = memo.get(query)
    if (cached != null) cached
    else {
      val v = featurizer.embedQuery(spark, query)
      memo.put(query, v)
      v
    }
  }

  /** O31/O32 — top-k retrieval: (id, text, score), best first.
    *
    * Volume dispatch (the 100-TB serving shape): the exact full-scan form
    * is linear in the corpus — it beats the reference's 2.3 s baseline
    * through sf10 (1.20 s warm over 500k docs) but flips at the next
    * decade — so past [[QueryEngine.ExactScanMaxRows]] the engine probes
    * an IVF index instead: rank centroids on the driver (nlist is small),
    * scan only the nprobe nearest cells (~nprobe/nlist of the corpus,
    * partition-pruned when the caller passed a cluster-partitioned
    * layout). Exact stays the oracle: below the threshold, for any
    * metric the index cannot serve (see [[dispatchableMetric]]), and —
    * when no caller layout exists — for the first
    * [[QueryEngine.AutoBuildAfter]] queries of the session (the build is
    * deferred until the query count can amortize it, see [[indexFor]]),
    * the full scan runs unchanged; the dispatched path's recall floor is
    * pinned PER METRIC in QueryEngineSpec (overlap ≥ 0.9 vs exact) and
    * gated at q175's serving roundtrip.
    */
  def topK(query: String, k: Int = 7,
      metric: Similarity.Metric = Similarity.Cosine): DataFrame = {
    val qv = embed(query)
    indexFor(metric) match {
      case Some(idx) =>
        val nprobe = math.max(8, idx.centers.length / 8)
        // probe geometry: L2 and cosine rank centroids against the raw
        // query (embedQuery output is unit-norm by the Featurizer
        // contract, and the cosine path stays bit-identical to its r15
        // gated behavior); the NEW dot path unitizes first so an
        // arbitrarily-scaled caller query still ranks cells by direction
        // — the only coordinate that matters on the unit-norm corpus the
        // dot dispatch requires
        val rq = if (metric == Similarity.InnerProduct) unitized(qv) else qv
        val probes = graft.operators.Ann.rankClusters(idx.centers, rq).take(nprobe)
        exactTopKOver(idx.assigned.filter(col("cluster").isin(probes: _*)), qv, k, metric)
      case None => exactTopKOver(corpus, qv, k, metric)
    }
  }

  /** Which metrics the IVF probe can serve without flipping to a linear
    * full scan at volume (the r15 verdict's item 3: an L2/dot topK over a
    * >100k-doc corpus silently reverted to exact — correct, but the same
    * linear-in-the-corpus shape the dispatch exists to prevent):
    *  - L2 dispatches unconditionally — nearest-centroid cells ARE the
    *    L2 Voronoi geometry, normalization is irrelevant;
    *  - Cosine dispatches unconditionally — the score is norm-invariant
    *    and the probe geometry assumes the Featurizer/VectorStore layout
    *    (unit-norm corpus), the documented engine contract since r15;
    *  - InnerProduct dispatches only when the corpus is measured
    *    unit-norm ([[corpusUnitNorm]], once per engine): at constant
    *    norm dot order == cosine order, while on an unnormalized corpus
    *    dot is a MIPS problem an L2 quantizer does not bound — exact
    *    stays the correct shape there (the decline branch).
    */
  private def dispatchableMetric(m: Similarity.Metric): Boolean = m match {
    case Similarity.L2 | Similarity.Cosine => true
    case Similarity.InnerProduct => corpusUnitNorm
  }

  private def unitized(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0 || n == 1.0) v else v.map(x => (x / n).toFloat)
  }

  /** Whether every corpus vector is unit-norm (float tolerance): one
    * codegen'd aggregate pass, measured once per engine lifetime like
    * [[corpusRows]], and only ever evaluated on the InnerProduct dispatch
    * decision — the cosine/L2 serving paths never pay it.
    */
  @transient private lazy val corpusUnitNorm: Boolean = {
    import graft.functions.VectorFunctions
    val dev = corpus
      .select(max(abs(VectorFunctions.dot(col(vecCol), col(vecCol)) - 1.0)))
      .head().get(0)
    dev != null && dev.asInstanceOf[Double] <= 2e-3
  }

  private def exactTopKOver(frame: DataFrame, qv0: Array[Float], k: Int,
      metric: Similarity.Metric): DataFrame = {
    val qv = Similarity.vecLit(qv0)
    val score = metric.expr(col(vecCol), qv).as("score")
    val ord =
      if (metric.descending) Seq(col("score").desc, col(idCol).asc)
      else Seq(col("score").asc, col(idCol).asc)
    frame.select(col(idCol), col(textCol), score).orderBy(ord: _*).limit(k)
  }

  /** Corpus cardinality, measured once per engine (a serving process
    * amortizes it over its lifetime, like the codegen warm-up).
    */
  @transient private lazy val corpusRows: Long = corpus.count()

  /** Plan-time small-corpus fast path: when the optimized plan's size
    * estimate is well under any plausible 100k-row corpus, skip the
    * count() job entirely — the dispatch answer is already "exact". The
    * 32 MB bound is conservative (an embedding row alone is ~300 B); a
    * hypothetical tinier-row corpus that slips under it merely stays on
    * the exact path — a latency choice at a size where exact is already
    * fast, never a correctness one. Measured: q175 constructs two
    * engines and paid 3 count jobs (+0.6 s at sf0.1) for dispatch
    * answers a byte estimate settles for free.
    */
  @transient private lazy val corpusLikelySmall: Boolean =
    corpus.queryExecution.optimizedPlan.stats.sizeInBytes <=
      QueryEngine.SmallCorpusBytes

  /** Whether the corpus sits past the dispatch threshold. The byte fast
    * path only stands in for the DEFAULT threshold; a caller that lowered
    * exactScanMaxRows (the specs force dispatch on test-sized corpora)
    * gets the real count.
    */
  @transient private lazy val pastThreshold: Boolean =
    !((exactScanMaxRows == QueryEngine.ExactScanMaxRows && corpusLikelySmall) ||
      corpusRows <= exactScanMaxRows)

  // deferred auto-build state — driver-side, guarded by `this`
  @transient private var exactQueriesServed: Int = 0
  @transient private var autoBuilt: Option[graft.operators.Ann.IvfIndex] = None

  /** The index serving this query, or None for the exact scan.
    *
    * Below the threshold (and for metrics the probe cannot serve — see
    * [[dispatchableMetric]]) the exact scan is both the oracle and the
    * faster path. Past it, a caller-provided layout wins from the FIRST
    * query (persisted, cluster-partitioned — probes are partition-pruned
    * scans, and the build was paid elsewhere). Without one, the build is
    * DEFERRED ski-rental-style: the first [[autoBuildAfter]] dispatched
    * queries run on the exact scan (bit-identical to the sub-threshold
    * behavior, each one corpus-linear but individually cheap), and only a
    * session that keeps querying pays the build — seeded coarse
    * quantizer, one codegen'd assignment pass, eagerly pinned so each
    * subsequent probe filters cached cluster rows instead of re-assigning
    * the corpus (lifetime = this engine's session, the serving contract).
    * A short-session engine (a gate, a one-shot batch answer) never pays
    * an index build it cannot amortize.
    */
  private def indexFor(metric: Similarity.Metric): Option[graft.operators.Ann.IvfIndex] =
    if (!pastThreshold || !dispatchableMetric(metric)) None
    else annIndex.orElse(this.synchronized {
      if (autoBuilt.isEmpty) {
        exactQueriesServed += 1
        if (exactQueriesServed > autoBuildAfter) {
          val nlist = math.max(64, math.min(4096,
            math.sqrt(corpusRows.toDouble).toInt))
          // widen before the assignment pass: nearest-centroid over nlist
          // centers is corpus_rows × nlist × dim flops, and a corpus
          // inheriting a narrow parquet layout runs it on a handful of
          // tasks (measured at sf10, 500k docs, nlist=707: 3.4 s at scan
          // width 32 vs ~50-70 s at the source's layout width — ScaleBench
          // fz_build_vs_scan); a no-op when the corpus is already wide
          val wide = graft.operators.Shuffle.ensureMinScanWidth(corpus)
          val idx = graft.operators.Ann.ivfBuild(
            wide, idCol, vecCol, nlist = nlist, seed = 42L, maxIter = 10)
          autoBuilt = Some(idx.copy(assigned = graft.operators.Materialize.eager(
            idx.assigned.select(col(idCol), col(textCol), col(vecCol), col("cluster")))))
        }
      }
      autoBuilt
    })

  /** O36 replacement — extractive answer: rank sentences of the top-k docs
    * by distinct query-term overlap (ties: doc rank, sentence position),
    * then greedily select `maxSentences` with a redundancy penalty (MMR
    * style: a candidate that mostly repeats already-selected sentences is
    * skipped in favor of new information). Context per doc is clipped to
    * 1000 chars like the reference (py:459).
    */
  def answer(query: String, k: Int = 7, maxSentences: Int = 3): String = {
    val hits = topK(query, k)
      .withColumn("ctx", TextFunctions.sentences(substring(col(textCol), 1, 1000)))
    val qTerms = array_distinct(TextFunctions.tokens(
      graft.functions.CleanFunctions.cleanText(lit(query))))
    val ranked = hits
      .select(col(idCol), col("score"), posexplode(col("ctx")).as(Seq("pos", "sentence")))
      .withColumn("overlap",
        size(array_intersect(
          array_distinct(TextFunctions.tokens(
            graft.functions.CleanFunctions.cleanText(col("sentence")))),
          qTerms)))
      .filter(col("overlap") > 0)
      .orderBy(col("overlap").desc, col("score").desc, col(idCol).asc, col("pos").asc)
      .limit(maxSentences * 4) // shortlist for the diversity pass
    val cands = ranked.select("sentence").collect().map(_.getString(0)).toSeq
    synthesizer.synthesize(query, cands, maxSentences)
  }

  /** O37 — the reference's response-evaluation heuristics (py:579-594):
    * term-overlap accuracy, length-based clarity, grounding via context
    * containment. Plain driver-side functions over one answer.
    */
  def evaluate(query: String, ans: String, contexts: Seq[String]): Map[String, Double] = {
    def terms(s: String): Set[String] =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").split("\\s+").filter(_.nonEmpty).toSet
    val qt = terms(query); val at = terms(ans)
    val accuracy = if (qt.isEmpty) 0.0 else qt.intersect(at).size.toDouble / qt.size
    val words = at.size.toDouble
    val clarity = if (words >= 5 && words <= 120) 1.0 else if (words > 0) 0.5 else 0.0
    val ct = contexts.flatMap(terms).toSet
    val grounding = if (at.isEmpty) 0.0 else at.intersect(ct).size.toDouble / at.size
    Map("accuracy" -> accuracy, "clarity" -> clarity, "grounding" -> grounding)
  }
}

object QueryEngine {
  /** Largest corpus the exact full-scan top-k still serves well. Measured
    * warm means (SCALE.md round 15, local[32]): 50k docs exact 0.150 s
    * vs IVF probe 0.093 s (just past break-even, both trivially under the
    * 2.3 s baseline); 500k docs exact 1.20 s vs dispatched 0.22 s — the
    * exact path grows linearly and breaches the baseline at the decade
    * after that. The threshold sits a little above the measured
    * break-even: below it the exact path is oracle-identical, absolute
    * latencies are tiny, and no index build/pin is worth carrying.
    */
  val ExactScanMaxRows: Long = 100000L

  /** Plan-size bound under which the dispatch probe skips its count()
    * job — see QueryEngine.corpusLikelySmall.
    */
  val SmallCorpusBytes: Long = 32L << 20

  /** Dispatched queries served by the exact scan before the in-memory
    * auto-build triggers (when no caller layout was provided).
    *
    * Ski-rental: the build costs a multiple of one exact scan — measured
    * at sf10 (500k docs, 64-dim, local[32], ScaleBench fz_build_vs_scan):
    * the engine-path build ≈ 12 s (defensive widen shuffle + kmeans fit
    * 3.7 + assignment/pin 3.4; ≈ 7 s on an already-wide corpus) vs
    * ≈ 0.5 s per warm exact scan — a ~15-25× ratio, so building on the
    * first query charges a short session
    * (a gate, a one-shot batch answer) the whole index for queries exact
    * would have served in single-digit seconds. Deferring until the
    * session has already spent roughly one build's worth of exact scans
    * bounds the worst case at 2× optimal whichever way the session goes,
    * the classic rent-vs-buy bound. Serving processes are unaffected:
    * they pass their persisted layout (used from query 1), and a
    * long-lived auto-build engine still converges to the same
    * pinned-probe steady state, just 16 queries later.
    */
  val AutoBuildAfter: Int = 16
}
