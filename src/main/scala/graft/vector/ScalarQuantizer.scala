package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.expressions.QuantizerExpressions
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Int8 scalar quantization — the training-free compression tier between
  * raw floats and PQ: each vector stores a per-vector scale (max|x|/127)
  * plus int8 codes, a 4× footprint cut with component-independent
  * reconstruction. The FAISS analog is SQ8 (the reference uses
  * uncompressed FAISS indexes, reference ai_powered_financial_analysis
  * .py:371-380; SQ8 is the standard first step when the corpus outgrows
  * memory). Unlike PQ there is no codebook to train and no lookup table
  * per query — the compressed scan is one int8×float dot per row.
  */
object ScalarQuantizer {

  /** Append the (scale, codes) struct — one codegen'd pass, no shuffle. */
  def encode(df: DataFrame, vecCol: String, dim: Int, sqCol: String = "sq"): DataFrame =
    df.withColumn(sqCol, QuantizerExpressions.int8Encode(col(vecCol), dim))

  /** Approximate inner product of an encoded row against a fixed query:
    * scale · Σ codes_i·q_i (one compressed kernel + one multiply).
    */
  def approxIp(sqCol: Column, query: Array[Float]): Column =
    sqCol.getField("scale").cast(DoubleType) *
      QuantizerExpressions.int8Dot(sqCol.getField("codes"), query)

  /** Top-k by compressed shortlist + exact rerank, codes and vectors as
    * SEPARATE inputs — the full-corpus scan touches only the int8 codes
    * (4× smaller); raw vectors are fetched for the shortlist ids only via
    * a broadcast semi-join. Ranking metric is inner product (descending),
    * matching the reference's IndexFlatIP default.
    */
  def search(
      codes: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, sqCol: String,
      query: Array[Float], k: Int, shortlist: Int): DataFrame = {
    val approx = codes
      .select(col(idCol), approxIp(col(sqCol), query).as("aip"))
      .orderBy(col("aip").desc, col(idCol).asc)
      .limit(shortlist)
    vectors
      .join(broadcast(approx.select(idCol)), Seq(idCol))
      .select(col(idCol),
        VectorFunctions.dot(col(vecCol), Similarity.vecLit(query)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Convenience form over a single encoded frame (column pruning keeps
    * the raw vectors out of the compressed branch).
    */
  def search(
      encoded: DataFrame, idCol: String, vecCol: String, sqCol: String,
      query: Array[Float], k: Int, shortlist: Int = 100): DataFrame =
    search(encoded.select(col(idCol), col(sqCol)),
      encoded.select(col(idCol), col(vecCol)),
      idCol, vecCol, sqCol, query, k, shortlist)
}
