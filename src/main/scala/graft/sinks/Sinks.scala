package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Output sinks (SURVEY.md §2.1 O7-O9, O23).
  *
  * The reference writes partitioned JSON (reference
  * ai_powered_financial_analysis.py:87), single-file JSON via `coalesce(1)`
  * (py:161-165), and single-file CSV with a read-back count verification
  * (py:296-311). `coalesce(1)` is an output-format requirement of those
  * paths, not an optimization — the partitioned writers are the scale path
  * (one file per partition, written in parallel); single-file mode is for
  * small curated exports only and would serialize a 100-TB write through one
  * task if misused, so it is a separate, explicitly-named API.
  */
object Sinks {

  /** O7 — partitioned JSON write (py:87). Scale path. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Partitioned parquet write — the engine's default persistence. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned ORC write — the columnar alternative for ORC-standard
    * warehouses; same pushdown/pruning properties as parquet under
    * Spark's vectorized ORC reader.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partitionCols`. Readers filtering on those columns scan only the
    * matching directories (partition pruning) — the storage-layout lever
    * that turns a 100-TB scan into a per-partition one. Choose low-to-mid
    * cardinality columns (date, source, language), never high-cardinality
    * keys (one directory per key kills the file system).
    *
    * When the partition cardinality is AT LEAST the cluster width,
    * `repartition(partitionCols)` before this write: otherwise every task
    * keeps an open writer per value it sees (tasks × values small files,
    * writer-rotation churn — measured 3.3× on the 64-cluster IVF layout,
    * ServingBench). Below the cluster width the dynamic write's extra
    * files are few and the repartition would SHRINK write parallelism to
    * the value count — keep the plain form (this method).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** O8 — single-file JSON export (py:161-165). Small results only. */
  def writeSingleJson(df: DataFrame, path: String): Unit =
    df.coalesce(1)
      .write.mode("overwrite")
      .format("json")
      .option("compression", "none")
      .save(path)

  /** O9 — single-file CSV export with header (py:296-300). */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .csv(path)

  /** O9 read-back verify (py:301-311): re-read the CSV with an explicit
    * schema and return it; callers compare counts/hashes against the
    * in-memory frame. Explicit schema keeps the round-trip type-exact
    * (header inference would re-string everything).
    */
  def readBackCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Write + read-back + count-and-content check in one call — the
    * `data_storing` contract (py:296-311) done as an assertion instead of
    * a printout. Content equality is a symmetric except (order-free set
    * compare), catching quoting/typing corruption a bare count would miss.
    */
  def writeCsvVerified(df: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    writeSingleCsv(df, path)
    val back = readBackCsv(df.sparkSession, path, df.schema)
    // Count both sides AND the multiset symmetric difference in ONE job:
    // tag written rows +1 and read-back rows -1, group by the full row,
    // and aggregate. The naive form (count + count + exceptAll ×2) costs
    // four jobs — pure fixed overhead on small exports, and four extra
    // full passes at scale.
    val cols = df.columns.toSeq
    val tagged = df.select(cols.map(col) :+ lit(1).as("__tag"): _*)
      .unionAll(back.select(cols.map(col) :+ lit(-1).as("__tag"): _*))
    val row = tagged.groupBy(cols.map(col): _*)
      .agg(sum(col("__tag")).as("__d"),
        count(when(col("__tag") === 1, 1)).as("__n"),
        count(when(col("__tag") === -1, 1)).as("__m"))
      // coalesce: an EMPTY export aggregates zero groups → null sums, and
      // an empty-but-equal round-trip must verify, not NPE
      .agg(coalesce(sum(abs(col("__d"))), lit(0L)).as("mismatch"),
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        coalesce(sum(col("__m")), lit(0L)).as("m"))
      .head()
    val (mismatch, n, m) = (row.getLong(0), row.getLong(1), row.getLong(2))
    require(m == n, s"read-back count $m != written count $n at $path")
    require(mismatch == 0,
      s"read-back content mismatch at $path: $mismatch rows differ between written and read-back multisets")
    back
  }
}
