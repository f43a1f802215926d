package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair edges: turns the pairwise output
  * of the Dedup family into actual keep/drop decisions (one representative
  * per duplicate cluster, smallest id wins).
  *
  * Algorithm: iterative minimum-label propagation with POINTER DOUBLING —
  * each round every node adopts the smallest label among itself and its
  * neighbors (one join + one aggregation, hash shuffles on node id), and
  * then additionally adopts the label OF its label (one more join). The
  * doubling step is what makes this scale: plain neighbor propagation
  * needs diameter rounds — a 6,000-hop chain (the shape a chain-window
  * candidate generator emits for a mega-cluster, or organic long paths
  * in web-dup graphs) would mean 6,000 Spark jobs with an ever-deepening
  * logical plan, and Catalyst planning cost alone grows super-linearly
  * in that depth (observed: a 20-round run already spends multiples of
  * its execution time in planning). With doubling, the distance a label
  * travels doubles every round, so rounds = O(log diameter): ~13 rounds
  * cover that 6,000-hop chain, and the default maxIter=25 covers any
  * component a 2⁶⁴-id space can express. No driver-side graph, no
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
      val propagated = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer doubling: l(x) ← min(l(x), l(l(x))). The label table maps
      // id → label, and a node's label IS a node id, so one self-join
      // reads the label's label; left join because the smallest node of
      // a component carries its own id (present), but a label may point
      // at a node whose own row is the identity (coalesce keeps it).
      val updatedPlan = propagated.as("x")
        .join(propagated.select(col("id").as("lid"), col("label").as("llabel")).as("y"),
          col("x.label") === col("y.lid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("llabel"), col("x.label"))).as("label"))
      // truncate the LOGICAL PLAN each round (RDD round-trip → LogicalRDD
      // scan): cache() shares the computation but Catalyst still re-plans
      // the full nested join tree every round, and with two self-joins
      // per round the tree doubles in width per round — planning work and
      // even the explain string go exponential (observed: heap exhaustion
      // from plan stringification at ~9 rounds). The RDD conversion keeps
      // RDD lineage intact, so executor loss recomputes blocks — this is
      // NOT the lineage-severing localCheckpoint the chaos harness
      // outlawed; it only resets the SQL plan to a constant-size scan.
      val updated = pairs.sparkSession
        .createDataFrame(updatedPlan.rdd, updatedPlan.schema)
        .cache()
      // pin the cache COMPLETELY before the previous round's cache is
      // released below: the changed-check's limit(1) can short-circuit
      // with only some partitions computed, and a partially-filled cache
      // whose parent was unpersisted recomputes the missing partitions
      // through every earlier round's lineage
      updated.count()
      val changed = updated.as("u").join(labels.as("l"), "id")
        .filter(col("u.label") =!= col("l.label")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // silently-wrong labels are worse than a loud stop: a component wider
    // than 2^maxIter doubling-hops must fail, not emit a partial
    // propagation
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "raise maxIter (doubling covers diameter ~2^maxIter; this should " +
        "not happen below astronomically deep components)")
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
