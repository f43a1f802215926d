package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.QueryEngine
import graft.vector.{Featurizer, VectorStore}

/** Build-once / query-many retrieval bench — the serving shape the
  * reference actually runs (its FAISS index is built once at startup,
  * reference ai_powered_financial_analysis.py:428-438; every user query
  * reuses it). The per-round bench otherwise charges index construction
  * to every retrieval query (r06 verdict: q36's 3.3 s is ~90% one-time
  * build), so this measures the two phases separately:
  *
  *   build  — fit featurizer, embed corpus, persist VectorStore + IDF
  *   warm   — load both once, pin the corpus in executor memory, then run
  *            repeated topK calls (distinct queries + exact repeats, so
  *            the embedding memo's hit path is exercised too)
  *
  * Reported: build seconds, mean/max warm per-query seconds over all
  * calls. Baseline for warm: the reference's ~2.3 s retrieval-only
  * latency (BASELINE.md).
  */
object ServingBench {

  /** Standalone entry for local iteration: ServingBench <sfDir> [cpus]. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (build, mean, max, n, annMean, annMax) = run(spark, sfDir)
    println(f"""{"build_sec":$build%.3f,"warm_query_mean_sec":$mean%.4f,"warm_query_max_sec":$max%.4f,"n_calls":$n,"ann_warm_mean_sec":$annMean%.4f,"ann_warm_max_sec":$annMax%.4f}""")
    spark.stop()
  }

  private val queries = Seq(
    "quarterly revenue growth outlook",
    "federal reserve interest rate decision",
    "supply chain disruption shipping costs",
    "artificial intelligence chip demand",
    "consumer spending retail sales",
    "energy prices crude oil futures",
    "merger acquisition deal announcement",
    "labor market unemployment claims",
    "housing starts mortgage rates",
    "earnings beat analyst estimates")

  /** Returns (build_sec, warm_mean_sec, warm_max_sec, n_calls,
    * ann_warm_mean_sec, ann_warm_max_sec).
    *
    * Two warm paths: exact full-scan topK (fine while the pinned corpus
    * fits executor memory) and the partition-pruned IVF probe — the shape
    * that stays bounded at 100 TB, reading ~nprobe/nlist of the corpus
    * from a cluster-partitioned layout instead of all of it.
    */
  def run(spark: SparkSession, sfDir: String): (Double, Double, Double, Int, Double, Double) = {
    // data-dir-keyed (round 16, same reason as the Queries scratch paths):
    // the driver's sf0.1 bench can overlap a background sf10 bench on the
    // same host, and a shared fixed store path tears the loaded layout
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        new java.io.File(sfDir).getCanonicalPath))
    val vecPath = s"/tmp/graft_bench_vecstore_$tag"
    val idfPath = s"/tmp/graft_bench_idf_$tag"
    val ivfPath = s"/tmp/graft_bench_ivf_$tag"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val t0 = System.nanoTime()
    // one-tokenization fit+embed (Featurizer.fitTransform): the TF frame
    // feeds the IDF fit and the scoring pass once instead of running the
    // regex battery twice over the corpus; the pinned result then feeds
    // the store write and the IVF build without re-embedding
    val fz = new Featurizer(dim = 384)
    val embedded = fz.fitTransform(docs, "text").select("doc_id", "text", "embedding")
    val tFit = System.nanoTime()
    VectorStore.save(embedded, vecPath)
    fz.save(idfPath)
    val tEmbed = System.nanoTime()
    // IVF layout: assignments written partitioned by cluster, so a probe
    // reads only its nprobe partitions (the q67 contract)
    val idx = graft.operators.Ann.ivfBuild(
      VectorStore.load(spark, vecPath), "doc_id", "embedding",
      nlist = 64, seed = 42L, maxIter = 10)
    val tIvf = System.nanoTime()
    // repartition ON the partition column before the dynamic-partition
    // write: without it every task keeps an open writer per cluster value
    // it sees (tasks × nlist small files, writer-rotation memory churn —
    // measured 67.7 s of a 139.8 s sf10 build); with it each exchange
    // partition holds whole clusters and writes one file per dir
    // (measured 20.7 s, 3.3×; build total 139.8 → 96.7 s — SCALE.md
    // round 15)
    idx.assigned.repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(ivfPath)
    val centers = idx.centers
    val tLayout = System.nanoTime()
    val buildSec = (tLayout - t0) / 1e9
    // stage decomposition on stderr (the stdout JSON line stays the
    // driver contract): fit_embed = the fused one-tokenization IDF fit +
    // corpus embed, pinned; save = VectorStore parquet write off the pin;
    // ivf = sample + driver Lloyd (assignment is lazy — it executes
    // inside the layout write); layout = assign + cluster-partitioned
    // write
    System.err.println(f"[serving] build stages: fit_embed=${(tFit - t0) / 1e9}%.1f " +
      f"save=${(tEmbed - tFit) / 1e9}%.1f ivf_fit=${(tIvf - tEmbed) / 1e9}%.1f " +
      f"assign_layout=${(tLayout - tIvf) / 1e9}%.1f")

    // serving process: load the persisted state, pin the corpus (a query
    // service holds its index in RAM — re-scanning parquet per query
    // would measure the filesystem, not retrieval), and hand the engine
    // the cluster-partitioned layout: topK volume-dispatches to the
    // partition-pruned IVF probe past ExactScanMaxRows (the exact scan
    // is linear in the corpus and flips past the reference baseline a
    // decade above sf10), and stays on the exact scan below it
    val served = VectorStore.load(spark, vecPath).cache()
    served.count()
    val ivf = spark.read.parquet(ivfPath)
    val engine = new QueryEngine(served, Featurizer.load(spark, idfPath),
      annIndex = Some(graft.operators.Ann.IvfIndex(
        ivf, centers, "doc_id", "embedding")))

    // untimed warm-up: first call pays whole-stage codegen compilation,
    // which a serving process amortizes over its lifetime
    engine.topK("warm up", k = 5).collect()
    // 2 passes over 10 distinct queries: pass 2 repeats pass 1 verbatim,
    // so its embeds are memo hits; retrieval dominates either way
    val times = (queries ++ queries).map { q =>
      val s0 = System.nanoTime()
      val n = engine.topK(q, k = 5).collect().length
      require(n == 5, s"serving topK returned $n rows")
      (System.nanoTime() - s0) / 1e9
    }
    served.unpersist(blocking = false)

    // ANN warm path: embed on the driver, rank centroids driver-side,
    // exact top-k inside the 8 nearest of 64 partitions — per query the
    // scan touches ~1/8 of the corpus off the partitioned layout
    graft.operators.Similarity.topK(
      ivf.filter(col("cluster").isin(
        graft.operators.Ann.rankClusters(centers, engine.embed("warm up")).take(8): _*)),
      "doc_id", "embedding", engine.embed("warm up"), 5,
      graft.operators.Similarity.Cosine).collect()
    val annTimes = (queries ++ queries).map { q =>
      val s0 = System.nanoTime()
      val qv = engine.embed(q)
      val probes = graft.operators.Ann.rankClusters(centers, qv).take(8)
      val n = graft.operators.Similarity.topK(
        ivf.filter(col("cluster").isin(probes: _*)),
        "doc_id", "embedding", qv, 5, graft.operators.Similarity.Cosine)
        .collect().length
      require(n == 5, s"serving ANN topK returned $n rows")
      (System.nanoTime() - s0) / 1e9
    }
    (buildSec, times.sum / times.size, times.max, times.size,
      annTimes.sum / annTimes.size, annTimes.max)
  }
}
