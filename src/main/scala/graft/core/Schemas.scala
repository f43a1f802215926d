package graft.core

import org.apache.spark.sql.types._

/** Centralized explicit schemas (SURVEY.md §1.1).
  *
  * The reference leans on `inferSchema` for CSV/JSON (reference py:205, py:334),
  * which is both an extra scan at plan time and the root cause of its all-string
  * SEC schema. The engine defaults to explicit schemas; inference stays available
  * behind a flag on the sources.
  */
object Schemas {

  /** SEC filings CSV, 15 columns — all strings at scan time; typed columns are
    * produced by the clean stage (comma-tolerant numeric parse).
    * Mirrors reference SEC_filings.csv:1 / py:205-209.
    */
  val secRaw: StructType = StructType(Seq(
    StructField("Ticker", StringType),
    StructField("Name", StringType),
    StructField("Sector", StringType),
    StructField("Asset Class", StringType),
    StructField("Market Value", StringType),
    StructField("Weight (%)", StringType),
    StructField("Notional Value", StringType),
    StructField("Quantity", StringType),
    StructField("Price", StringType),
    StructField("Location", StringType),
    StructField("Exchange", StringType),
    StructField("Currency", StringType),
    StructField("FX Rate", StringType),
    StructField("Market Currency", StringType),
    StructField("Accrual Date", StringType)
  ))

  /** CNBC article JSON (reference py:74-83). */
  val article: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("date", StringType),
    StructField("content", StringType)
  ))

  /** Reddit post JSON (reference py:135-141); Post_Time stays string at scan,
    * cast to timestamp downstream (both `yyyy-MM-dd HH:mm:ss` and ISO-8601
    * dialects accepted — SURVEY §7.4(5)).
    */
  val redditPost: StructType = StructType(Seq(
    StructField("Title", StringType),
    StructField("URL", StringType),
    StructField("Upvotes", IntegerType),
    StructField("Comments_Count", IntegerType),
    StructField("Post_Time", StringType)
  ))

  /** Unified retrieval corpus (SURVEY A4): embeddings are a first-class
    * array<float> column, replacing the reference's pandas/FAISS side-car
    * (reference py:357-375).
    */
  def corpus(dim: Int): StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("date", TimestampType),
    StructField("url", StringType),
    StructField("source", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = true,
      new MetadataBuilder().putLong("dim", dim.toLong).build())
  ))

  /** Declared embedding dimension of a corpus schema (set by [[corpus]]). */
  def embeddingDim(schema: StructType): Option[Long] = {
    val f = schema.fields.find(_.name == "embedding")
    f.collect { case fld if fld.metadata.contains("dim") => fld.metadata.getLong("dim") }
  }

  /** Multimodal column convention: opaque binary payload + typed metadata. */
  val multimodal: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|text
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))
  ))

  case class SecFiling(
      ticker: String, company_name: String, sector: String,
      market_value: Option[Float], weight_percent: Option[Float],
      share_price: Option[Float], shares_quantity: Option[Int],
      country: String, stock_exchange: String, accrual_date: String,
      record_id: String)

  case class Article(url: String, title: String, date: String, content: String)

  case class RedditPost(
      Title: String, URL: String, Upvotes: Option[Int],
      Comments_Count: Option[Int], Post_Time: String)
}
