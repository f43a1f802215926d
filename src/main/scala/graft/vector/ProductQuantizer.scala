package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Product quantization — the compression side of the reference's FAISS
  * lineage (IVF-PQ is FAISS's workhorse index; the reference uses the
  * uncompressed IVFFlat, reference ai_powered_financial_analysis.py:730-737).
  *
  * A d-dim vector is split into `m` subvectors; each subspace gets a
  * ksub-entry KMeans codebook; a vector is stored as m small codes
  * (m bytes at ksub=256 vs 4·d bytes float — a 16-32× footprint cut, which
  * at 100 TB of embeddings is the difference between spilling and fitting
  * executor memory). Search uses asymmetric distance computation (ADC):
  * per query, one m×ksub lookup table of exact subspace distances is
  * computed on the driver, and a candidate's approximate distance is m
  * table lookups — no float math per row. Final ranking reranks an ADC
  * shortlist with exact distances, restoring recall.
  *
  * Codebooks are driver-side literals (m·ksub·(d/m) floats — a few KB),
  * inlined into the expressions: encode and score are pure column maps,
  * no shuffle, no UDF.
  */
final class ProductQuantizer private (
    val dim: Int, val m: Int, val ksub: Int,
    codebooks: Array[Array[Array[Float]]]) extends Serializable {

  private val dsub = dim / m

  private def subvec(vec: Column, j: Int): Column =
    slice(vec, j * dsub + 1, dsub)

  /** array<int> of m codebook indices (0-based) for each vector — one
    * codegen'd kernel (graft.expressions.PqEncode) with the codebook bank
    * as a reference object. The previous `transform`-over-`typedlit` form
    * was a CodegenFallback higher-order function: an interpreted lambda
    * per (subspace × codeword) per row, exactly wrong for the distributed
    * encode pass that touches every corpus vector.
    */
  def encodeExpr(vec: Column): Column =
    graft.expressions.QuantizerExpressions.pqEncode(vec, codebooks)

  def encode(df: DataFrame, vecCol: String, codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, encodeExpr(col(vecCol)))

  /** ADC lookup tables for one query: lut(j)(c) = ||q_j - codebook_j(c)||². */
  private def lut(query: Array[Float]): Array[Array[Double]] =
    Array.tabulate(m) { j =>
      val q = query.slice(j * dsub, (j + 1) * dsub)
      codebooks(j).map { c =>
        var s = 0.0; var i = 0
        while (i < dsub) { val d = q(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
        s
      }
    }

  /** Approximate squared-L2 distance of an encoded row to `query`:
    * m table lookups in one codegen'd kernel, zero per-row float math.
    */
  def adcExpr(codeCol: Column, query: Array[Float]): Column =
    graft.expressions.QuantizerExpressions.pqAdc(codeCol, lut(query))

  /** Top-k by ADC shortlist + exact rerank, with the code table and the
    * vector table as SEPARATE inputs — the whole point of PQ at 100 TB is
    * that the full-corpus scan touches only the m-byte codes (16-32×
    * smaller than the floats); the raw vectors are fetched for the
    * `shortlist` surviving ids only, via a broadcast semi-join of the tiny
    * shortlist against the vector table. Recall lost to quantization is
    * recovered as long as the true top-k lands in the shortlist.
    *
    * `codes` needs (idCol, codeCol); `vectors` needs (idCol, vecCol).
    */
  def search(
      codes: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, codeCol: String,
      query: Array[Float], k: Int, shortlist: Int): DataFrame = {
    val approx = codes
      .select(col(idCol), adcExpr(col(codeCol), query).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(shortlist)
    vectors
      .join(broadcast(approx.select(idCol)), Seq(idCol))
      .select(col(idCol),
        VectorFunctions.l2(col(vecCol), Similarity.vecLit(query)).as("score"))
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(k)
  }

  /** Convenience form over a single encoded frame: the ADC shortlist branch
    * still projects (id, code) only — column pruning keeps the vectors out
    * of the compressed scan — and the rerank branch fetches vectors for the
    * shortlist ids.
    */
  def search(
      encoded: DataFrame, idCol: String, vecCol: String, codeCol: String,
      query: Array[Float], k: Int, shortlist: Int = 100): DataFrame =
    search(encoded.select(col(idCol), col(codeCol)),
      encoded.select(col(idCol), col(vecCol)),
      idCol, vecCol, codeCol, query, k, shortlist)
}

object ProductQuantizer {

  /** Train per-subspace codebooks with seeded driver-side Lloyd over ONE
    * bounded collected sample (same rationale as the IVF coarse quantizer:
    * codebook quality needs a representative sample, never the corpus, and
    * m sequential distributed KMeans fits paid ~m·maxIter job dispatches —
    * the dominant cost of the round-3 q51 bench). All m subspaces train
    * from slices of the same sample; zero Spark jobs beyond the collect.
    */
  def train(
      corpus: DataFrame, vecCol: String, dim: Int,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      maxIter: Int = 25, fitSample: Double = 1.0,
      maxFitPoints: Int = 1 << 16): ProductQuantizer = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val sample = KMeansLite.sampleVectors(corpus, vecCol, fitSample, maxFitPoints, seed)
    val codebooks = Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      KMeansLite.fit(pts, ksub, maxIter, seed + j).map(_.map(_.toFloat))
    }
    new ProductQuantizer(dim, m, ksub, codebooks)
  }
}
