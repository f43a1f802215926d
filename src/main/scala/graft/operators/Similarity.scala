package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** Similarity search (SURVEY.md §2.1 O31-O33): exact top-k as the baseline
  * and oracle, bucketed ANN as the scale path.
  *
  * Scale design: single-query exact top-k compiles to
  * `TakeOrderedAndProject` (per-partition bounded heaps + driver merge of k
  * rows per partition) — no global sort, no shuffle of the corpus. Batched
  * top-k shuffles once on query_id. Distance math stays in codegen'd
  * higher-order functions over `array<float>` with double accumulation
  * (VectorFunctions), so the scan pipeline is one whole-stage-codegen span.
  */
object Similarity {

  sealed trait Metric {
    /** distance/score expression */
    def expr(a: Column, b: Column): Column
    /** true if higher is better (order DESC) */
    def descending: Boolean
  }
  case object L2 extends Metric {
    def expr(a: Column, b: Column): Column = VectorFunctions.l2(a, b)
    val descending = false
  }
  case object InnerProduct extends Metric {
    def expr(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
    val descending = true
  }
  case object Cosine extends Metric {
    def expr(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)
    val descending = true
  }

  /** Literal column for a driver-side query vector. */
  def vecLit(q: Array[Float]): Column =
    array(q.map(v => lit(v)): _*)

  /** O31/O32 — exact top-k for one query vector (the reference's
    * `IndexFlatL2.search` / `IndexFlatIP.search`, reference
    * ai_powered_financial_analysis.py:371-380, py:428-430).
    * Ties broken by id so results are total-ordered and reproducible.
    * Physical plan: TakeOrderedAndProject over the scan.
    */
  def topK(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, metric: Metric = InnerProduct): DataFrame = {
    val score = metric.expr(col(vecCol), vecLit(query)).as("score")
    val ord =
      if (metric.descending) Seq(col("score").desc, col(idCol).asc)
      else Seq(col("score").asc, col(idCol).asc)
    corpus.select(col(idCol), score).orderBy(ord: _*).limit(k)
  }

  /** Batched exact top-k: broadcast the (small) query set against the
    * corpus, rank per query with a window. One shuffle on query_id; corpus
    * is scanned once for all queries.
    */
  def topKBatch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, metric: Metric = InnerProduct): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qidCol), col(idCol),
        metric.expr(col(vecCol), col(qvecCol)).as("score"))
    val ord =
      if (metric.descending) Seq(col("score").desc, col(idCol).asc)
      else Seq(col("score").asc, col(idCol).asc)
    val w = Window.partitionBy(col(qidCol)).orderBy(ord: _*)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }

  /** Batched top-k via the bounded-heap aggregate: only k (score, id)
    * pairs per query per map partition cross the shuffle — use this form
    * when the corpus is large relative to queries × k (the window form
    * shuffles every scored pair). Maximizing metrics only (the aggregate
    * keeps highest scores; for L2, search on negated distance upstream).
    */
  def topKBatchAgg(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, metric: Metric = InnerProduct): DataFrame = {
    require(metric.descending, "topKBatchAgg keeps maxima; negate the score for distances")
    corpus.crossJoin(broadcast(queries))
      .select(col(qidCol),
        metric.expr(col(vecCol), col(qvecCol)).as("score"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col(qidCol))
      .agg(graft.expressions.TopKAggregate
        .topKByScore(col("score"), col("__id"), k).as("top"))
      .select(col(qidCol), explode(col("top")).as("e"))
      .select(col(qidCol), col("e.id").as(idCol), col("e.score").as("score"))
  }
}
