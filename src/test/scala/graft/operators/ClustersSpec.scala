package graft.operators

import graft.SparkSpec

class ClustersSpec extends SparkSpec {

  test("connectedComponents labels every member with the component minimum") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2,2-3,3-4; {10,11}; {20,21,22} via star
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("da", "db")
    val got = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pointer doubling: a deep chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // a 400-hop path graph: plain neighbor propagation needs 400 rounds
    // (and would throw at the default maxIter=25); doubling needs ~9.
    // maxIter=15 both proves the log behavior and keeps the old
    // linear-propagation implementation from ever passing this test.
    val pairs = (0L until 400L).map(i => (i, i + 1)).toDF("da", "db")
    val got = Clusters.connectedComponents(pairs, maxIter = 15).collect()
    assert(got.length == 401)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("dropDuplicateClusters keeps one representative per cluster plus untouched rows") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val kept = Clusters.dropDuplicateClusters(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // 2,3 fold into 1; 6 into 5; 4 untouched
  }

  test("end-to-end: minhash pairs -> clusters -> deduped corpus") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " tail"), (3L, base.replace("w40", "x")),
      (4L, (1 to 40).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, minJaccard = 0.5)
    val kept = Clusters.dropDuplicateClusters(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L)) // 2 and 3 are near-dups of 1; 4 survives
  }
}
