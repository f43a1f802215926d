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
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark 4 has no
      // native type for; read as long and convert (Tables.table).
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

  /** Parquet scan; Catalyst pushes filters/pruning into the scan.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS,false), a type Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]); with `nanosAsLong` it lands as a long which we
    * convert to microseconds by integer division (`div` — exact, no double
    * round-trip) and expose as TIMESTAMP_NTZ, matching DuckDB's own ns→µs
    * truncation so oracle comparisons agree.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // only the conf the scan itself needs — a table loader must not mutate
    // session-wide semantics like the time zone as a side effect
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else df
  }
}
