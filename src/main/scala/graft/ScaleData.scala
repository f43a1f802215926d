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
    if (replicas > 2 * dim) return scaleEmbeddingsWide(df, replicas, maxId, dim)
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

  /** Embedding replication past the shift/flip family's distinctness
    * budget. The column-expression construction above has exactly 2·dim
    * distinct orthogonal transforms (dim cyclic shifts × a global sign
    * flip): replica r and r' carry the SAME transform whenever
    * r ≡ r' (mod dim) with matching flip state, so past 2·dim replicas
    * the pool silently contains cross-replica EXACT duplicate vectors —
    * which a near-dup join dutifully reports, inflating result pairs
    * with replication artifacts. (The 200-replica sf20 pool generated in
    * round 9 has this: replicas 128-199 twin replicas 64-135, 72·2000 =
    * 144k artifact pairs inside its recorded 198,000 — the straddle
    * RECALL numbers are unaffected because they count only planted ids,
    * but result-pair totals on that pool overstate genuine near-dups.)
    *
    * Here replica r = block·(2·dim) + base composes the base transform
    * T_base (the same shift+flip, so block 0 reproduces the old
    * construction bit-for-bit) with a per-block seeded coordinate
    * PERMUTATION P_block (block ≥ 1). Permutations are orthogonal, so
    * norms and all within-replica dot products stay invariant — each
    * replica still reproduces the original neighborhood graph — while
    * distinctness now holds for (64!)-ish blocks: P_b'∘T_β' = P_b∘T_β
    * with b ≠ b' would need the random permutation pair to land exactly
    * on one of the 2·dim signed rotations. Runs as a UDF over
    * corpus × replicas (a test-data tool, like the document cipher).
    */
  private def scaleEmbeddingsWide(
      df: DataFrame, replicas: Int, maxId: Long, dim: Int): DataFrame = {
    val family = 2 * dim
    val f = udf((emb: Seq[Float], r: Int) => {
      val base = r % family
      val block = r / family
      val shift = (7 * base) % dim
      val flip = base >= dim
      // T_base: rotate left by shift, then optional global sign flip
      val t = Array.tabulate(dim) { i =>
        val v = emb((i + shift) % dim)
        if (flip) -v else v
      }
      if (block == 0) t.toSeq
      else {
        val perm = new scala.util.Random(block.toLong * 1000003L + 7L)
          .shuffle((0 until dim).toList).toArray
        Array.tabulate(dim)(i => t(perm(i))).toSeq
      }
    })
    df.crossJoin(spark_range(df.sparkSession, replicas))
      .select((col("vec_id") + col("r") * maxId).as("vec_id"),
        f(col("embedding"), col("r").cast("int")).as("embedding"), col("label"))
  }

  private def spark_range(spark: SparkSession, n: Int) =
    spark.range(n.toLong).select(col("id").as("r"))

  def scaleLineitem(df: DataFrame, replicas: Int): DataFrame = {
    val maxKey = df.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    (0 until replicas).map { r =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * maxKey))
    }.reduce(_ union _)
  }

  /** Full-schema scale-up for the sf1 CORRECTNESS run (round-10 verdict
    * item 6): every table the 179 verify queries read, with key shifts
    * chosen so cross-table joins stay semantically intact.
    *
    *  - dimensions (region/nation/customer/supplier/part) copy UNSCALED:
    *    facts reference the same dimension rows, so each dimension key
    *    simply owns replicas× more fact rows — the natural shape of a
    *    fact table growing against a stable dimension.
    *  - orders + lineitem key-shift o_orderkey/l_orderkey with ONE
    *    SHARED base (max over both tables' key domains), so the
    *    orders⋈lineitem equi-join maps each replica onto itself — the
    *    independently-computed per-table max in [[scaleLineitem]] is
    *    fine for the single-table scale workloads but would misalign
    *    the join.
    *  - events shift event_id AND user_id (sessions/users replicate
    *    cleanly) while keeping ts untouched — event-time density grows
    *    replicas×, which is exactly the watermark/session stress the
    *    sf1 run exists to exercise.
    *  - documents/embeddings use the structure-preserving transforms
    *    above.
    */
  def scaleVerifyDir(
      spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    // each table lands as ONE PLAIN FILE named <table>.parquet, matching
    // the driver-generated testdata layout exactly — the streaming loader
    // (Tables.eventsStream) globs for the literal leaf name, so a
    // Spark-written DIRECTORY of part files is invisible to it (the sf1
    // q116 failure this function originally caused)
    def write(df: DataFrame, t: String): Unit = {
      val staging = s"$outDir/.staging_$t"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val dir = new java.io.File(staging)
      val part = dir.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $staging"))
      val target = new java.io.File(s"$outDir/$t.parquet")
      if (target.exists()) { def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(target) }
      java.nio.file.Files.move(part.toPath, target.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(read(t), t)
    }
    val orders = read("orders")
    val lineitem = read("lineitem")
    val orderBase = math.max(
      orders.agg(max(col("o_orderkey"))).head().getLong(0),
      lineitem.agg(max(col("l_orderkey"))).head().getLong(0)) + 1
    write((0 until replicas).map(r =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(r * orderBase)))
      .reduce(_ union _), "orders")
    write((0 until replicas).map(r =>
      lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderBase)))
      .reduce(_ union _), "lineitem")
    val events = read("events")
    val eventBase = events.agg(max(col("event_id"))).head().getLong(0) + 1
    val userBase = events.agg(max(col("user_id"))).head().getLong(0) + 1
    write((0 until replicas).map(r =>
      events
        .withColumn("event_id", col("event_id") + lit(r * eventBase))
        .withColumn("user_id", col("user_id") + lit(r * userBase)))
      .reduce(_ union _), "events")
    write(scaleDocuments(read("documents"), replicas), "documents")
    write(scaleEmbeddings(read("embeddings"), replicas), "embeddings")
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
    // optional 4th arg: comma-separated table subset (e.g. "embeddings"
    // for the IMI decade point, where only vectors are needed and the
    // document cipher's 312-transform family would repeat at 1000
    // replicas anyway), or "verify" for the full-schema join-consistent
    // set the 179-query correctness run reads
    if (args.length > 3 && args(3).trim == "verify") {
      scaleVerifyDir(spark, srcDir, outDir, replicas)
      println(s"""{"out":"$outDir","replicas":$replicas,"tables":"verify"}""")
      spark.stop()
      return
    }
    val tables: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set("documents", "embeddings", "lineitem")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    if (tables("documents"))
      scaleDocuments(read("documents"), replicas)
        .repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    if (tables("embeddings"))
      scaleEmbeddings(read("embeddings"), replicas)
        .repartition(math.max(8, replicas / 50))
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    if (tables("lineitem"))
      scaleLineitem(read("lineitem"), replicas)
        .repartition(16).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    println(s"""{"out":"$outDir","replicas":$replicas,"tables":"${tables.mkString(",")}"}""")
    spark.stop()
  }
}
