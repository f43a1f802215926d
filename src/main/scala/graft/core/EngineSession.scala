package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      shufflePartitions: Int = 32
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan; Catalyst pushes filters/pruning into the scan. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
