package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Schemas
import graft.functions.CleanFunctions._
import graft.ingest.CsvSource
import graft.operators.Dedup
import graft.sinks.Sinks

/** The reference's main batch pipeline (SURVEY.md §3.1): SEC filings CSV →
  * clean → metadata extraction → single-file CSV store with read-back
  * verification (reference ai_powered_financial_analysis.py:203-311).
  *
  * Intended semantics, not bug-compat (SURVEY §1.4): comma-grouped numerics
  * parse instead of casting to null; defaults apply AFTER the cast;
  * record_id is a real string concat (the reference's `+` produced
  * all-null doubles). One cache() at the clean boundary kills the
  * reference's recompute-per-action behavior (§4).
  */
object SecEtl {

  /** O1 — ingest with explicit all-string schema (py:203-218). */
  def ingest(spark: SparkSession, path: String): DataFrame =
    CsvSource(path, Some(Schemas.secRaw)).load(spark)

  /** O12/O13/O15/O16/O19 — clean (py:228-257, fixed semantics). */
  def clean(raw: DataFrame): DataFrame = {
    val df = raw
      .withColumn("Name", normalizeKey(col("Name")))
      .withColumn("Sector", normalizeKey(col("Sector")))
      .withColumn("Ticker", normalizeKey(col("Ticker")))
      .withColumn("Sector", coalesce(col("Sector"), lit("unknown")))
      .withColumn("Market Value", numericWithDefault(col("Market Value"), 0.0, FloatType))
      .withColumn("Weight (%)", numericWithDefault(col("Weight (%)"), 0.0, FloatType))
      .withColumn("Quantity", parseNumeric(col("Quantity"), IntegerType))
      .withColumn("Price", parseNumeric(col("Price"), FloatType))
    // tiebreak on the VALUE columns (keys are constant within a window
    // partition and would leave the winner shuffle-order-dependent): the
    // surviving row for a revised duplicate holding is pinned
    val valueCols = df.columns.filterNot(Seq("Ticker", "Name").contains).map(col).toSeq
    Dedup.firstRowByKey(df, Seq("Ticker", "Name"), valueCols)
  }

  /** O11/O18 — projection + rename + real record id (py:267-287). */
  def extractMetadata(cleaned: DataFrame): DataFrame =
    cleaned.select(
      col("Ticker").as("ticker"),
      col("Name").as("company_name"),
      col("Sector").as("sector"),
      col("Market Value").as("market_value"),
      col("Weight (%)").as("weight_percent"),
      col("Price").as("share_price"),
      col("Quantity").as("shares_quantity"),
      col("Location").as("country"),
      col("Exchange").as("stock_exchange"),
      col("Accrual Date").as("accrual_date"),
      recordId(col("Ticker"), col("Name")).as("record_id"))

  /** O9/O21/O23 — store + read-back verify (py:296-311). */
  def store(meta: DataFrame, path: String): DataFrame =
    Sinks.writeCsvVerified(meta, path)

  /** Full pipeline; cache at the clean boundary (SURVEY §4). */
  def run(spark: SparkSession, inPath: String, outPath: String): DataFrame = {
    val cleaned = clean(ingest(spark, inPath)).cache()
    val meta = extractMetadata(cleaned)
    store(meta, outPath)
  }
}
