package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair edges: turns the pairwise output
  * of the Dedup family into actual keep/drop decisions (one representative
  * per duplicate cluster, smallest id wins).
  *
  * Algorithm: iterative minimum-label propagation — every node adopts the
  * smallest label among itself and its neighbors until fixpoint. Each
  * round is one join + one aggregation (both hash shuffles on node id);
  * rounds needed = component diameter (near-dup clusters are shallow —
  * a dozen rounds covers pathological chains). No driver-side graph, no
  * all-pairs: state is one (node, label) row per node.
  */
object Clusters {

  /** (doc_id, cluster_id) for every node appearing in `pairs` (da, db);
    * cluster_id = smallest doc_id in the component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // smallest label among each node's neighbors
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("nid"))
        .agg(min(col("label")).as("nlabel"))
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cache()
      val changed = updated.as("u").join(labels.as("l"), "id")
        .filter(col("u.label") =!= col("l.label")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // silently-wrong labels are worse than a loud stop: a component wider
    // than maxIter hops must fail, not emit a partial propagation
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "a component's diameter exceeds maxIter; raise it for deep chains")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Drop every non-representative member of each duplicate cluster from
    * `df` (rows absent from any pair are kept untouched).
    */
  def dropDuplicateClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    df.join(losers, df(idCol) === losers("doc_id"), "left_anti")
  }
}
