package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable ingestion (SURVEY.md §2.1 O1-O6, §3.2).
  *
  * The reference scans CSV with header/quote/escape options (reference
  * ai_powered_financial_analysis.py:203-218), line-delimited JSON
  * (py:334-338), and fetches live content on executors via
  * `parallelize(urls).map(fetch)` (py:48-70). The engine keeps the same
  * surface but defaults to explicit schemas — `inferSchema` costs an extra
  * full scan at plan time and produced the reference's all-string SEC schema
  * (SURVEY §1.1) — and hides the network behind a `Source` so zero-egress
  * tests substitute fixtures.
  */
trait Source {
  def load(spark: SparkSession): DataFrame
}

/** O1 — CSV scan with the reference's option set (py:203-218). */
final case class CsvSource(
    path: String,
    schema: Option[StructType] = None,
    header: Boolean = true,
    quote: String = "\"",
    escape: String = "\"",
    inferSchema: Boolean = false
) extends Source {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("quote", quote)
      .option("escape", escape)
    val r2 = schema match {
      case Some(s) => r.schema(s)
      case None    => r.option("inferSchema", inferSchema.toString)
    }
    r2.csv(path)
  }
}

/** O2 — line-delimited JSON scan (py:334-338). */
final case class JsonSource(path: String, schema: Option[StructType] = None)
    extends Source {
  def load(spark: SparkSession): DataFrame = schema match {
    case Some(s) => spark.read.schema(s).json(path)
    case None    => spark.read.json(path)
  }
}

/** Columnar ORC scan — Spark's other native columnar format; same
  * pushdown/pruning behavior as parquet.
  */
final case class OrcSource(path: String, schema: Option[StructType] = None)
    extends Source {
  def load(spark: SparkSession): DataFrame = schema match {
    case Some(s) => spark.read.schema(s).orc(path)
    case None    => spark.read.orc(path)
  }
}

/** One-string-per-line text scan (raw corpus drops). */
final case class TextSource(path: String, wholeFile: Boolean = false)
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)
}

/** Whole-file binary scan — the ingest path for media payloads: each file
  * becomes (path, modificationTime, length, content), feeding
  * graft.multimodal.Multimodal's layout. `pathGlobFilter` bounds the file
  * set; at scale prefer many medium files over millions of tiny ones (one
  * task per file).
  */
final case class BinaryFileSource(path: String, globFilter: Option[String] = None)
    extends Source {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read.format("binaryFile")
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}

object Sources {

  /** O3+O4+O5 — driver-list source with an executor-side per-element fetch
    * (the reference's `parallelize(urls).map(get_article_details)` +
    * null-drop, py:48-70). The fetch function runs inside `mapPartitions` on
    * executors — same placement as the reference — and failed fetches are
    * dropped via `Option`, not nulls. At scale this distributes I/O across
    * the cluster; `slices` bounds fetch parallelism.
    */
  def fetched[A: scala.reflect.ClassTag, B: Encoder: scala.reflect.ClassTag](
      spark: SparkSession,
      items: Seq[A],
      fetch: A => Option[B],
      slices: Int = 8
  ): Dataset[B] = {
    val rdd = spark.sparkContext.parallelize(items, math.min(slices, math.max(1, items.size)))
    spark.createDataset(rdd.mapPartitions(_.flatMap(a => fetch(a))))
  }

  /** O6 — typed driver-list source (`createDataFrame(rows, schema)` analog,
    * py:151-154), for already-materialized small collections.
    */
  def fromSeq[A: Encoder](spark: SparkSession, items: Seq[A]): Dataset[A] =
    spark.createDataset(items)
}
