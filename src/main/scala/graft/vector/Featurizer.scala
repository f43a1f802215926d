package graft.vector

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Normalizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.functions.TextFunctions

/** Deterministic sentence-embedding replacement (SURVEY.md §2.1 O30).
  *
  * The reference embeds with SentenceTransformers `all-MiniLM-L6-v2`
  * (384-dim, reference ai_powered_financial_analysis.py:354, py:369); model
  * downloads are unavailable here, so the engine ships a deterministic
  * TF-IDF featurizer — tokens → HashingTF(dim) → IDF → L2 normalize —
  * behind the same interface, producing a first-class `array<float>` column
  * (the reference kept vectors in a pandas/FAISS side-car, py:357-375).
  * Semantically weaker than MiniLM, but dimension/norm/top-k mechanics are
  * identical, and the interface swaps in a real model unchanged.
  *
  * Scale: HashingTF is stateless (murmur3, fixed seed); IDF is one
  * aggregate over the corpus; transform is a pure map — no shuffle in the
  * embed pass.
  */
final class Featurizer(val dim: Int = 384) extends TextEmbedder {

  @transient private var idfModel: IDFModel = _

  private def tf(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.withColumn("__toks", TextFunctions.tokens(
      graft.functions.CleanFunctions.cleanText(col(textCol))))
    new HashingTF().setInputCol("__toks").setOutputCol("__tf").setNumFeatures(dim)
      .transform(toks)
  }

  /** Fit the IDF weights on a corpus. Must be called before transform. */
  def fit(corpus: DataFrame, textCol: String): this.type = {
    idfModel = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
      .fit(tf(corpus, textCol))
    this
  }

  /** Fit the IDF weights AND embed the fitting corpus in ONE
    * tokenization pass, returning the embedded corpus pinned
    * (Materialize.eager — lineage-backed, chaos-safe).
    *
    * fit→transform runs the clean/tokenize/HashingTF battery over the
    * corpus TWICE — once feeding the document-frequency aggregate, once
    * feeding the scoring pass — and at volume that regex battery is the
    * dominant cost, not the dim-wide aggregate (measured at sf10, 500k
    * docs, local[32]: the fit pass alone is ~23 s warm while the IDF
    * aggregate it feeds is a small tail; ScaleBench fz_* arms). Here the
    * TF frame is computed once, persisted (memory, disk spill — at
    * cluster scale a spilled read beats re-running the regex battery),
    * used for both the fit and the scoring, and released once the
    * returned frame is materialized. Output is bit-identical to
    * fit+transform: the same operators over the same TF values, computed
    * once. Lifetime contract matches Materialize.eager: the pin registers
    * in the session CacheManager; harness mains clear it per query and
    * long-lived callers release via clearCache()/unpersist.
    */
  def fitTransform(corpus: DataFrame, textCol: String,
      outCol: String = "embedding"): DataFrame = {
    val tfFrame = tf(corpus, textCol).drop("__toks").persist()
    idfModel = new IDF().setInputCol("__tf").setOutputCol("__tfidf").fit(tfFrame)
    val normed = new Normalizer().setInputCol("__tfidf").setOutputCol("__n").setP(2.0)
      .transform(idfModel.transform(tfFrame))
    val out = normed
      .withColumn(outCol, vector_to_array(col("__n"), "float32"))
      .drop("__tf", "__tfidf", "__n")
    val pinned = graft.operators.Materialize.eager(out)
    tfFrame.unpersist(blocking = false)
    pinned
  }

  /** Embed `textCol` into `outCol: array<float>` (L2-normalized). */
  def transform(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    require(idfModel != null, "Featurizer.fit must run before transform")
    val scored = idfModel.transform(tf(df, textCol))
    val normed = new Normalizer().setInputCol("__tfidf").setOutputCol("__n").setP(2.0)
      .transform(scored)
    normed
      .withColumn(outCol, vector_to_array(col("__n"), "float32"))
      .drop("__toks", "__tf", "__tfidf", "__n")
  }

  /** Embed a single query string ON THE DRIVER — no Spark job. Replicates
    * the exact corpus path (same clean/tokenize regexes, HashingTF.indexOf
    * for the murmur3 bucket, the fitted IDF weights, L2 norm, float32
    * narrowing), so query vectors are bit-identical to `transform`'s while
    * per-query latency drops from a scheduled job to microseconds — the
    * query path of a retrieval engine must not pay job-dispatch overhead
    * (the reference's `model.encode(query)` is likewise in-process,
    * reference ai_powered_financial_analysis.py:426).
    */
  def embedQuery(spark: SparkSession, query: String): Array[Float] = {
    require(idfModel != null, "Featurizer.fit must run before embedQuery")
    // mirror CleanFunctions.cleanText + TextFunctions.tokens
    val cleaned = query.toLowerCase
      .replaceAll("<.*?>", "")
      .replaceAll("[^a-z0-9\\s]", "")
      .trim
    // NO empty-filter: Spark's split("\\s+") of an empty string yields [""]
    // and HashingTF hashes it — mirror that exactly for bit-parity
    val toks = cleaned.split("\\s+")
    val htf = new HashingTF().setNumFeatures(dim)
    val counts = new Array[Double](dim)
    toks.foreach(t => counts(htf.indexOf(t)) += 1.0)
    val idf = idfModel.idf.toArray
    var i = 0
    var norm = 0.0
    while (i < dim) { counts(i) *= idf(i); norm += counts(i) * counts(i); i += 1 }
    val n = math.sqrt(norm)
    val out = new Array[Float](dim)
    if (n > 0) { i = 0; while (i < dim) { out(i) = (counts(i) / n).toFloat; i += 1 } }
    out
  }

  /** Persist the fitted state (the IDF weights — HashingTF is stateless).
    * A query service loads this and embeds without refitting the corpus.
    */
  def save(path: String): Unit = {
    require(idfModel != null, "Featurizer.fit must run before save")
    idfModel.write.overwrite().save(path)
  }
}

object Featurizer {
  /** Restore a fitted featurizer; the dimension is the IDF vector's size. */
  def load(spark: SparkSession, path: String): Featurizer = {
    val model = IDFModel.load(path)
    val fz = new Featurizer(model.idf.size)
    fz.idfModel = model
    fz
  }
}

/** Vector-index persistence (SURVEY.md §2.1 O34): the reference pickles a
  * FAISS index + doc list (py:432-438); here the "index" IS a parquet table
  * of (id, text, embedding) — readable by any executor, no driver state.
  */
object VectorStore {
  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ------------------------------------------------- versioned serving
  // Incremental index refresh composed over Layout.CommitLog (the serving
  // half of build-once/query-many): a rebuild stages its data in a fresh
  // per-version directory and becomes visible ATOMICALLY when the commit
  // marker publishes, so a reader resolving "latest" during a concurrent
  // rebuild always loads a complete version — never a torn, half-written,
  // or in-place-overwritten index (plain save() overwrites the live dir,
  // which a concurrent reader can see half-replaced). Version dirs are
  // immutable after publish, so a resolved (version, DataFrame) pair stays
  // valid for the reader's whole query lifetime.

  /** Publish `df` as the next index version; returns the version. */
  def commitVersion(spark: SparkSession, table: String, df: DataFrame): Int =
    graft.storage.Layout.CommitLog.commit(spark, table, df)

  /** Highest published version, None before the first commit. */
  def latestVersion(spark: SparkSession, table: String): Option[Int] =
    graft.storage.Layout.CommitLog.latestVersion(spark, table)

  /** Load one immutable published version. */
  def loadVersion(spark: SparkSession, table: String, v: Int): DataFrame =
    spark.read.parquet(s"$table/v$v")

  /** Resolve-and-load the latest published version. The returned frame is
    * pinned to the resolved version dir — a refresh landing after this
    * call never mutates what this reader scans.
    */
  def loadLatest(spark: SparkSession, table: String): (Int, DataFrame) = {
    val v = latestVersion(spark, table).getOrElse(throw new IllegalStateException(
      s"VectorStore: no published version in $table"))
    (v, loadVersion(spark, table, v))
  }
}
