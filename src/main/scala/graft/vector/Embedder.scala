package graft.vector

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions, TextFunctions}

/** The embedding contract (SURVEY.md §2.1 O30, §7.4(1)) — the seam where a
  * real sentence-transformer replaces the deterministic stand-in.
  *
  * The reference embeds with `all-MiniLM-L6-v2` (reference
  * ai_powered_financial_analysis.py:354,369); this engine runs zero-egress,
  * so the default implementation is the hash-TF-IDF [[Featurizer]]. Every
  * consumer (QueryEngine, the q36/q37 gates, VectorStore builds) depends on
  * this trait only, so swapping in a local-weights model is a construction-
  * site change, not an engine change.
  */
trait TextEmbedder extends Serializable {

  /** Output dimensionality of [[transform]] / [[embedQuery]] vectors. */
  def dim: Int

  /** Corpus-dependent fitting (IDF weights, …). Pretrained implementations
    * are free to make this a no-op; callers always invoke it once before
    * transform so both kinds run unchanged.
    */
  def fit(corpus: DataFrame, textCol: String): this.type

  /** Embed `textCol` into `outCol: array<float>` (L2-normalized). */
  def transform(df: DataFrame, textCol: String, outCol: String = "embedding"): DataFrame

  /** Embed one query string ON THE DRIVER — bit-identical to the executor
    * path of [[transform]], without paying job dispatch per query.
    */
  def embedQuery(spark: SparkSession, query: String): Array[Float]

  /** Persist whatever state [[transform]] needs so a serving process can
    * load and embed without refitting.
    */
  def save(path: String): Unit
}

/** Loadable-weights embedder — the ONNX-ready half of the seam.
  *
  * Embedding = mean-pool of per-token weight columns, L2-normalized: each
  * token hashes (same murmur3 bucketing as [[Featurizer]]) to a column of a
  * pretrained `dim × buckets` float matrix. This is exactly the shape of a
  * distilled bag-of-embeddings model (word2vec/fastText-class), and the
  * matrix is the stand-in for an ONNX session: when real exported weights
  * exist locally, they load through the same file format and every
  * downstream consumer (VectorStore, QueryEngine, the ANN indexes) runs
  * unchanged. No fitting — the weights ARE the model.
  *
  * Scale: the matrix broadcasts once (384 × 32768 floats ≈ 50 MB — executor
  * cache, not per-task); the embed pass stays map-only. The per-row kernel
  * is a Scala closure rather than a codegen expression — acceptable off the
  * hot path because a real replacement would be an ONNX batch call anyway
  * (the JNI boundary forecloses codegen fusion regardless).
  */
final class ModelEmbedder private[vector] (
    val dim: Int, val buckets: Int, private[vector] val weights: Array[Float])
  extends TextEmbedder {

  require(weights.length == dim * buckets,
    s"ModelEmbedder: weights length ${weights.length} != dim $dim * buckets $buckets")

  /** Pretrained — fitting is a no-op by design. */
  def fit(corpus: DataFrame, textCol: String): this.type = this

  // one broadcast per (embedder, SparkContext), not per transform call:
  // the ~50 MB matrix would otherwise accumulate un-destroyed copies over
  // a long serving session. Keyed by context identity — a broadcast made
  // on a stopped context is unusable, so a session restart (sequential
  // suites, serving-process bounce) must re-broadcast, not re-serve it.
  @transient private var bcCache: org.apache.spark.broadcast.Broadcast[Array[Float]] = _
  @transient private var bcCtx: org.apache.spark.SparkContext = _

  private def broadcastWeights(df: DataFrame) = synchronized {
    val sc = df.sparkSession.sparkContext
    if (bcCache == null || (bcCtx ne sc)) {
      bcCache = sc.broadcast(weights)
      bcCtx = sc
    }
    bcCache
  }

  /** Release the cached weight broadcast (driver + executor copies).
    * Call when retiring an embedder instance in a long-lived process;
    * safe to call repeatedly or with the owning context already stopped.
    */
  def dispose(): Unit = synchronized {
    if (bcCache != null) {
      try bcCache.destroy() catch { case _: Exception => () }
      bcCache = null
      bcCtx = null
    }
  }

  def transform(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val bc = broadcastWeights(df)
    val d = dim; val nb = buckets
    val embed = udf { (toks: Seq[String]) => ModelEmbedder.pool(bc.value, d, nb, toks) }
    df.withColumn(outCol, embed(
      TextFunctions.tokens(CleanFunctions.cleanText(col(textCol)))))
  }

  def embedQuery(spark: SparkSession, query: String): Array[Float] = {
    // mirror CleanFunctions.cleanText + TextFunctions.tokens exactly, like
    // Featurizer.embedQuery — driver and executor paths must bit-match
    val cleaned = query.toLowerCase
      .replaceAll("<.*?>", "")
      .replaceAll("[^a-z0-9\\s]", "")
      .trim
    ModelEmbedder.pool(weights, dim, buckets, cleaned.split("\\s+").toSeq)
  }

  /** Binary format: magic "GFTW", int32 dim, int32 buckets, then
    * dim·buckets float32, all little-endian. Trivially writable from any
    * exporter (a 10-line numpy `tofile` produces it).
    */
  def save(path: String): Unit = {
    val buf = ByteBuffer.allocate(12 + 4 * weights.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(ModelEmbedder.Magic).putInt(dim).putInt(buckets)
    weights.foreach(buf.putFloat)
    Files.write(Paths.get(path), buf.array())
  }
}

object ModelEmbedder {
  val Magic: Int = 0x47465457 // "GFTW" little-endian tag

  def apply(dim: Int, buckets: Int, weights: Array[Float]): ModelEmbedder =
    new ModelEmbedder(dim, buckets, weights)

  def load(path: String): ModelEmbedder = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 12, s"ModelEmbedder: $path too short (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, f"ModelEmbedder: bad magic 0x$magic%08x in $path")
    val dim = buf.getInt; val buckets = buf.getInt
    require(dim > 0 && buckets > 0 && bytes.length == 12L + 4L * dim * buckets,
      s"ModelEmbedder: inconsistent header dim=$dim buckets=$buckets len=${bytes.length}")
    val w = new Array[Float](dim * buckets)
    var i = 0
    while (i < w.length) { w(i) = buf.getFloat; i += 1 }
    new ModelEmbedder(dim, buckets, w)
  }

  // shared per bucket count: indexOf is a pure murmur3-mod, and allocating
  // a transformer per ROW inside the embed UDF would churn millions of
  // short-lived objects on the map-only pass
  private val htfCache = new java.util.concurrent.ConcurrentHashMap[Int, HashingTF]()

  /** Mean-pool the weight columns of the hashed tokens, L2-normalize,
    * narrow to float32. Shared verbatim by driver and executor paths.
    */
  private[vector] def pool(w: Array[Float], dim: Int, buckets: Int,
      toks: Seq[String]): Array[Float] = {
    val htf = htfCache.computeIfAbsent(buckets, b => new HashingTF().setNumFeatures(b))
    val acc = new Array[Double](dim)
    var n = 0
    toks.foreach { t =>
      val b = htf.indexOf(t) * dim
      var i = 0
      while (i < dim) { acc(i) += w(b + i); i += 1 }
      n += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) {
      if (n > 0) acc(i) /= n
      norm += acc(i) * acc(i); i += 1
    }
    val s = math.sqrt(norm)
    val out = new Array[Float](dim)
    if (s > 0) { i = 0; while (i < dim) { out(i) = (acc(i) / s).toFloat; i += 1 } }
    out
  }
}

/** Implementation selection: a local weights file activates the model
  * embedder; its absence falls back to the deterministic featurizer. The
  * default path keeps the choice declarative (drop a file, get a model)
  * without any code or config change — the zero-egress build simply never
  * has the file.
  */
object Embedders {
  val DefaultWeightsPath = "models/embedder.gftw"

  // system property first (settable in-process — tests activate against a
  // generated fixture), then environment, then the canonical drop-in path
  def weightsPath: String =
    sys.props.get("graft.embed.weights")
      .orElse(sys.env.get("GRAFT_EMBED_WEIGHTS"))
      .getOrElse(DefaultWeightsPath)

  /** `fallbackDim` sizes the hash featurizer ONLY; a present weights file
    * wins and its own dimensionality governs (the model is the truth —
    * callers must not assume the returned embedder has `fallbackDim`;
    * read `.dim` and size stores/indexes from it).
    */
  def default(fallbackDim: Int = 384): TextEmbedder =
    if (Files.exists(Paths.get(weightsPath))) ModelEmbedder.load(weightsPath)
    else new Featurizer(fallbackDim)
}
