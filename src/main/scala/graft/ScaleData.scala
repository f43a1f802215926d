package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Scale-up generator for the sf1 scaling proof (round-6 verdict, next-
  * round item 1): replicates the sf0.1 tables N× with per-replica
  * transforms chosen so each workload's STRUCTURE scales linearly instead
  * of degenerating — naive replication would make every document an exact
  * 10-way duplicate and every vector a 10-way cos=1.0 near-dup, exploding
  * candidate pairs quadratically and measuring the wrong thing.
  *
  *   documents — replica r≥1 Caesar-ciphers the letters of every token
  *     EXCEPT stopwords and language-marker words. A cipher is a bijection
  *     on words, so within-replica duplicate/near-dup structure, token
  *     counts, word lengths, frequency shape, stopword ratio, and langId
  *     are preserved exactly, while cross-replica shingle overlap drops to
  *     stopword-only n-grams (below any LSH threshold).
  *   embeddings — replica r cyclically shifts vector coordinates by 7·r:
  *     norms and ALL within-replica dot products are invariant (shift is
  *     orthogonal), so each replica reproduces the original neighborhood
  *     graph; cross-replica cosines decorrelate.
  *   lineitem — key-shifted (l_orderkey += r·(max+1)); value columns
  *     untouched so the Z-order value distribution just widens one axis.
  *
  * Writes to outDir; tables not needed by the headline scale workloads
  * are not generated. This is a test-data TOOL: the per-row cipher runs
  * in a UDF by design — it is not an engine operator, and keeping it
  * simple beats keeping it codegen'd.
  */
object ScaleData {

  /** Words whose identity carries signal for quality/langId scoring —
    * exempt from the cipher so those distributions survive replication.
    */
  private val exempt: Set[String] =
    TF.stopwords.toSet ++ TF.langMarkers.flatMap(_._2)

  /** Multipliers coprime to 26 — each (a, b) pair below is a distinct
    * affine bijection on the alphabet, giving 12·26 = 312 distinct
    * ciphers before the sequence repeats. A plain Caesar shift has period
    * 26: at 100 replicas, replicas r and r+26 would carry IDENTICAL text
    * and re-introduce exactly the cross-replica duplicate blowup the
    * cipher exists to prevent (observed: 819k near-dup pairs instead of
    * the expected 25.6k at 100×).
    */
  private val affineA = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Per-replica affine letter substitution c → a·c + b (mod 26);
    * digits/punct unchanged; bijective for every replica < 312.
    */
  private[graft] def cipher(text: String, r: Int): String = {
    if (r == 0 || text == null) return text
    val a = affineA((r / 26) % affineA.length)
    val b = (7 * r) % 26
    val sb = new java.lang.StringBuilder(text.length)
    // word-at-a-time so exempt words pass through untouched
    var i = 0
    val n = text.length
    while (i < n) {
      var j = i
      while (j < n && !text.charAt(j).isWhitespace) j += 1
      val word = text.substring(i, j)
      // exemption must see the word as the cleaners do — adjacent
      // punctuation ("the," / "el.") would otherwise defeat it and let
      // stopwords/lang markers get ciphered, shifting quality and langId
      // distributions across replicas
      val core = word.toLowerCase.dropWhile(!_.isLetterOrDigit)
        .reverse.dropWhile(!_.isLetterOrDigit).reverse
      if (exempt.contains(core)) sb.append(word)
      else {
        var k = 0
        while (k < word.length) {
          val c = word.charAt(k)
          sb.append(
            if (c >= 'a' && c <= 'z') (((a * (c - 'a') + b) % 26) + 'a').toChar
            else if (c >= 'A' && c <= 'Z') (((a * (c - 'A') + b) % 26) + 'A').toChar
            else c)
          k += 1
        }
      }
      while (j < n && text.charAt(j).isWhitespace) { sb.append(text.charAt(j)); j += 1 }
      i = j
    }
    sb.toString
  }

  def scaleDocuments(df: DataFrame, replicas: Int): DataFrame = {
    val maxId = df.agg(max(col("doc_id"))).head().getLong(0) + 1
    val cipherUdf = udf((t: String, r: Int) => cipher(t, r))
    (0 until replicas).map { r =>
      df.select((col("doc_id") + lit(r * maxId)).as("doc_id"),
        cipherUdf(col("text"), lit(r)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
  }

  def scaleEmbeddings(df: DataFrame, replicas: Int): DataFrame = {
    val maxId = df.agg(max(col("vec_id"))).head().getLong(0) + 1
    // derive dim from the data — a hardcoded dim with slice() would
    // silently truncate mismatched fixtures instead of failing loudly
    val dim = df.select(size(col("embedding"))).head().getInt(0)
    val badDim = df.filter(size(col("embedding")) =!= dim).count()
    require(badDim == 0, s"scaleEmbeddings: $badDim rows with dim != $dim")
    (0 until replicas).map { r =>
      // shift alone has period dim — compose with a global sign flip for
      // r ≥ dim (also orthogonal) so all replicas < 2·dim are distinct and
      // cross-replica cosines can never hit ±duplicates of each other
      // at the 100-replica scale point
      val shift = (7 * r) % dim
      val shifted =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift))
      val signed =
        if (r < dim) shifted
        else transform(shifted, x => (-x).cast(org.apache.spark.sql.types.FloatType))
      df.select((col("vec_id") + lit(r * maxId)).as("vec_id"),
        signed.as("embedding"), col("label"))
    }.reduce(_ union _)
  }

  def scaleLineitem(df: DataFrame, replicas: Int): DataFrame = {
    val maxKey = df.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    (0 until replicas).map { r =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * maxKey))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    scaleDocuments(read("documents"), replicas)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(read("embeddings"), replicas)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    scaleLineitem(read("lineitem"), replicas)
      .repartition(16).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    println(s"""{"out":"$outDir","replicas":$replicas}""")
    spark.stop()
  }
}
