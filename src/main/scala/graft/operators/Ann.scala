package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** Approximate nearest neighbor search — the scale path over the exact
  * `Similarity.topK` oracle (SURVEY.md §2.1 O33; the reference's FAISS
  * IVFFlat with nlist=100, reference ai_powered_financial_analysis.py:730-737).
  *
  * Two implementations:
  *  - LSH (random hyperplane buckets via spark.ml BucketedRandomProjectionLSH)
  *    — index-free, good for L2;
  *  - IVF (KMeans coarse quantizer + nprobe cluster pruning) — the direct
  *    Spark-native analog of the reference's IVFFlat: the corpus is
  *    partitioned by centroid id, and a query only scans the nprobe nearest
  *    clusters, pruning (nlist - nprobe)/nlist of the data. On a real
  *    cluster the corpus is written partitioned by `cluster` so the probe
  *    is a partition-pruned scan, not a filter over everything.
  */
object Ann {

  // ---------------------------------------------------------------- IVF

  final case class IvfIndex(
      assigned: DataFrame,             // corpus + `cluster` column
      centers: Array[Array[Double]],   // driver-side centroids (nlist × dim)
      idCol: String, vecCol: String)

  /** Build the IVF index: fit a seeded KMeans coarse quantizer and assign
    * every vector to its centroid. Deterministic for a fixed seed.
    * Fit cost is bounded by `maxIter`; assignment is one map pass.
    * `fitSample` < 1.0 trains the quantizer on a seeded sample — the
    * standard IVF practice at corpus scale (centroid quality needs a
    * representative sample, not every vector), cutting build cost while
    * the full corpus is still assigned and searchable.
    */
  def ivfBuild(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 100, seed: Long = 42L, maxIter: Int = 20,
      fitSample: Double = 1.0): IvfIndex = {
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol).cast(ArrayType(DoubleType))))
    val fitSet = if (fitSample < 1.0) withVec.sample(fitSample, seed) else withVec
    val km = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__v").setPredictionCol("cluster")
    val model = km.fit(fitSet)
    val assigned = model.transform(withVec).drop("__v")
    IvfIndex(assigned, model.clusterCenters.map(_.toArray), idCol, vecCol)
  }

  /** IVF search: rank clusters by centroid distance on the driver (nlist is
    * small), then run exact top-k inside the nprobe nearest clusters only.
    */
  def ivfSearch(
      index: IvfIndex, query: Array[Float], k: Int,
      nprobe: Int = 8, metric: Similarity.Metric = Similarity.Cosine): DataFrame = {
    val qd = query.map(_.toDouble)
    def l2sq(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - qd(i); s += d * d; i += 1 }
      s
    }
    val probes = index.centers.zipWithIndex
      .sortBy { case (c, i) => (l2sq(c), i) }
      .take(nprobe).map(_._2)
    val pruned = index.assigned.filter(col("cluster").isin(probes: _*))
    Similarity.topK(pruned, index.idCol, index.vecCol, query, k, metric)
  }

  // ---------------------------------------------------------------- LSH

  /** LSH-bucketed approximate top-k via spark.ml's random-projection LSH.
    * `approxNearestNeighbors` prunes to colliding hash buckets before
    * computing exact distances. Euclidean metric only (the library's).
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      bucketLength: Double = 2.0, numHashTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol).cast(ArrayType(DoubleType))))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("__v").setOutputCol("__h")
    val model = lsh.fit(withVec)
    val qv = org.apache.spark.ml.linalg.Vectors.dense(query.map(_.toDouble))
    model.approxNearestNeighbors(withVec, qv, k)
      .select(col(idCol), col("distCol").as("score"))
  }
}
