package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CleanFunctions

/** Retrieval-corpus assembly (SURVEY.md §2.1 O20, O24-O28).
  *
  * The reference materializes CNBC ∪ Reddit to pandas on the driver, then
  * fills/renames/concats there (reference ai_powered_financial_analysis.py:
  * 334-369) — a driver bottleneck the moment the corpus outgrows RAM. Here
  * the corpus never leaves Spark: `unionByName(allowMissingColumns)` +
  * `na.fill` + column concat, all lazy and distributed.
  *
  * Also fixes the silent CNBC drop (SURVEY §1.4(4)): the reference's
  * field-priority list was case-sensitive and missed the real lowercase
  * JSON keys, so its RAG corpus was Reddit-only. `assemble` matches fields
  * case-insensitively.
  */
object CorpusAssembly {

  /** O20/O24 — schema-aligned union of source frames (positional `union` in
    * the reference, py:336; by-name here so column order can't silently
    * mispair).
    */
  def union(sources: Seq[DataFrame]): DataFrame =
    sources.reduce(_.unionByName(_, allowMissingColumns = true))

  /** O25/O26/O27 — fill + text assembly from a priority field list, matched
    * case-insensitively against actual columns. Rows whose assembled text
    * is empty are dropped (py:422's skip-empty).
    */
  def assemble(df: DataFrame, fieldPriority: Seq[String] = Seq("title", "content", "summary", "text", "headline", "body")): DataFrame = {
    val byLower = df.columns.groupBy(_.toLowerCase).map { case (k, v) => k -> v.head }
    val present = fieldPriority.flatMap(f => byLower.get(f.toLowerCase)).distinct
    require(present.nonEmpty, s"none of $fieldPriority present in ${df.columns.mkString(",")}")
    val txt = CleanFunctions.extractText(present.map(col))
    df.withColumn("text", txt).filter(length(col("text")) > 0)
  }

  /** Stable doc ids for a corpus that lacks them. Uses a hash of the text
    * (content-addressed — reproducible across runs and cluster sizes,
    * unlike monotonically_increasing_id which is partition-layout-dependent).
    */
  def withDocId(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("doc_id", xxhash64(col(textCol)))
}
