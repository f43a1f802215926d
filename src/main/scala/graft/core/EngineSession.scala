package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Session factory with the engine's tuned defaults.
  *
  * Design notes (scale): shuffle partitions default to the local core count
  * here, but on a real cluster callers pass `shufflePartitions` sized to
  * ~128MB per post-shuffle partition. AQE is on so skewed joins re-plan at
  * runtime; UTC session TZ pins timestamp semantics for cross-engine parity.
  * Replaces the reference's ad-hoc Colab session (reference
  * ai_powered_financial_analysis.py:36-44).
  */
object EngineSession {
  def builder(
      master: String = "local[32]",
      appName: String = "graft-engine",
      shufflePartitions: Int = 32,
      kryo: Boolean = false
  ): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName(appName)
    // the reference configures Kryo + a 1000M buffer (reference
    // ai_powered_financial_analysis.py:41-42); optional here — Spark 4
    // Encoders make it mostly moot, but the surface is preserved
    if (kryo) b
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryoserializer.buffer.max", "1000m")
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE coalesce CACHED plans too: off (the default), persist()
      // freezes the plan at raw shuffle.partitions granularity, so every
      // Materialize.eager intermediate materializes one task per
      // configured partition regardless of data volume — measured 3.5×
      // on the candidate-bounded dedup path at partitions=2000 (the
      // high-partition sweep, SCALE.md round 14). The conf exists because
      // changed cache partitioning can surprise consumers that RELY on it;
      // no engine path does (cached intermediates feed joins/aggs that
      // re-shuffle anyway).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // some testdata generations carry events.ts as TIMESTAMP(NANOS), which
      // Spark 4 has no native type for; this conf makes that encoding scan as
      // long, and Tables.adaptEventsTs converts whichever type arrives.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  def create(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Ensure runtime confs needed by the table loaders are present on an
    * externally-created session (the driver's Verify/Bench mains).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize `events.ts` regardless of the file's physical timestamp
    * encoding. The testdata has shipped with two encodings across rounds:
    *
    *   - TIMESTAMP(NANOS): Spark 4 has no nanosecond type and rejects the
    *     scan ([PARQUET_TYPE_ILLEGAL]) unless `nanosAsLong` maps it to a
    *     long, which we divide to microseconds (`div` — exact integer
    *     truncation, matching DuckDB's own ns→µs cast).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads this
    *     natively as TIMESTAMP_NTZ; no conversion needed.
    *
    * Branching on the scanned type (not the file version) means either
    * encoding — or a future drift back — loads without code changes.
    *
    * `ntz = true` (batch) lands on TIMESTAMP_NTZ for bit-parity with the
    * DuckDB oracle; `ntz = false` (streaming) lands on instant TIMESTAMP
    * because watermarks require it — the session TZ is pinned UTC, so the
    * instant equals the file's naive value and casting the output back to
    * NTZ stays exact.
    */
  def adaptEventsTs(df: DataFrame, ntz: Boolean): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val micros = timestamp_micros(expr("ts div 1000"))
        df.withColumn("ts", if (ntz) micros.cast(TimestampNTZType) else micros)
      case TimestampNTZType =>
        if (ntz) df
        else df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        if (ntz) df.withColumn("ts", col("ts").cast(TimestampNTZType)) else df
      case other =>
        throw new IllegalStateException(
          s"events.ts scanned as unsupported type $other; expected long (nanosAsLong), timestamp, or timestamp_ntz")
    }

  /** Parquet scan; Catalyst pushes filters/pruning into the scan. `events`
    * gets the schema-adaptive ts normalization (see [[adaptEventsTs]]).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // only the conf the scan itself needs — a table loader must not mutate
    // session-wide semantics like the time zone as a side effect
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") adaptEventsTs(df, ntz = true) else df
  }

  /** File-source stream over `events.parquet` with the same schema-adaptive
    * ts handling as the batch loader, landed as instant TIMESTAMP (the type
    * watermarks require). The schema comes from a one-off batch probe scan
    * — a file stream cannot infer. Replaces the per-query copies of this
    * loader that made one physical-type drift a 13-site hunt (round-9
    * verdict item 2).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the footer probe is memoized: stream-stream queries call this twice
    // per query and re-probing the same immutable fixture is pure waste
    // (round-10 ADVICE). The entry carries the file tree's total length +
    // max mtime so an in-place fixture rewrite (a test regenerating
    // events.parquet mid-JVM) naturally misses instead of silently
    // streaming with a stale schema (round-11 ADVICE); a stat walk is
    // ~µs against the footer probe's full Spark job. One entry per dir,
    // REPLACED on fingerprint mismatch (round-12 ADVICE) — keying by
    // (dir, fingerprint) accumulated an entry per rewrite, and mtime's
    // 1s granularity on some filesystems could then serve a stale schema
    // for a same-length same-second rewrite from an old key.
    val fp = eventsFingerprint(dir)
    val rawSchema = eventsSchemaCache.compute(dir, (d, old) =>
      if (old != null && old._1 == fp) old
      else (fp, spark.read.parquet(s"$d/events.parquet").schema))._2
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    adaptEventsTs(stream, ntz = false)
  }

  /** Cheap content fingerprint of `dir`/events.parquet (file, or Spark
    * directory layout of part files): total byte length + max mtime over
    * the tree. Collisions require a same-length same-mtime rewrite —
    * not a mode any fixture generator here produces.
    */
  private def eventsFingerprint(dir: String): (Long, Long) = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        f.listFiles() match {
          case null => (0L, f.lastModified())
          case kids => kids.foldLeft((0L, f.lastModified())) { case ((len, mt), k) =>
            val (kl, km) = walk(k); (len + kl, math.max(mt, km))
          }
        }
      else (f.length(), f.lastModified())
    walk(new java.io.File(dir, "events.parquet"))
  }

  // dir → (fingerprint, schema); bounded at one live entry per dir
  private val eventsSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, ((Long, Long), org.apache.spark.sql.types.StructType)]()

  /** Exact row count of `dir`/events.parquet read from parquet FOOTERS —
    * no Spark job. The streaming queries size their state-store partition
    * count from this volume probe (Queries.withStatePartitions, whose
    * comment always promised "parquet metadata-only" but whose
    * implementation ran a count() job — 13 streaming queries × one full
    * scan job per bench run for a number every footer already carries).
    * None on any read failure so callers can fall back to the count()
    * job. Memoized under the same content fingerprint as the schema
    * cache: one entry per dir, replaced on rewrite.
    */
  def eventsRowCount(dir: String): Option[Long] = {
    val fp = eventsFingerprint(dir)
    eventsRowsCache.compute(dir, (d, old) =>
      if (old != null && old._1 == fp) old
      else (fp, footerRowCount(new java.io.File(d, "events.parquet"))))._2
  }

  private def footerRowCount(root: java.io.File): Option[Long] =
    try {
      def leaves(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.flatMap(leaves)
        else if (f.getName.endsWith(".parquet")) Seq(f)
        else Seq.empty
      // a bare path named events.parquet is itself a parquet file; a
      // Spark-written directory holds .parquet part files (+ _SUCCESS)
      val files = if (root.isFile) Seq(root) else leaves(root)
      if (files.isEmpty) return None
      val conf = new org.apache.hadoop.conf.Configuration()
      Some(files.map { f =>
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try {
          import scala.jdk.CollectionConverters._
          in.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        }
        finally in.close()
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => None }

  // dir → (fingerprint, row count); bounded at one live entry per dir
  private val eventsRowsCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, ((Long, Long), Option[Long])]()
}
