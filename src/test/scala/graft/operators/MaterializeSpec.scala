package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Materialize.eager's contract (see its scaladoc): ONE computation
  * shared by every consumer, with lineage kept so lost blocks recompute —
  * the property that made it replace localCheckpoint after the round-9
  * chaos harness killed a checkpoint-backed query
  * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND under executor SIGKILL).
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  // a row-counting accumulator threaded through a UDF makes "how many
  // times did the producing plan actually run" directly observable
  private def countedFrame(name: String) = {
    val acc = spark.sparkContext.longAccumulator(name)
    val tick = udf { (x: Long) => acc.add(1L); x }
    val df = spark.range(1000).select(tick(col("id")).as("v"))
    (df, acc)
  }

  test("eager computes the producing plan exactly once for N consumers") {
    spark.catalog.clearCache()
    val (df, acc) = countedFrame("mat_once")
    val m = Materialize.eager(df)
    assert(acc.value == 1000L, "eager() itself must have run the plan once")
    // three separate downstream actions: all must read the cache
    assert(m.count() == 1000L)
    assert(m.agg(sum("v")).head().getLong(0) == (0L until 1000L).sum)
    assert(m.filter(col("v") < 10).count() == 10L)
    assert(acc.value == 1000L,
      s"consumers recomputed the producer: accumulator ${acc.value} != 1000")
    spark.catalog.clearCache()
  }

  test("lineage survives cache release: consumers recompute, not crash") {
    // the anti-property of localCheckpoint: after its blocks are gone the
    // query DIES. eager()'s persist keeps lineage, so after the harness's
    // clearCache the same frame must still answer (by recomputing).
    spark.catalog.clearCache()
    val (df, acc) = countedFrame("mat_lineage")
    val m = Materialize.eager(df)
    assert(acc.value == 1000L)
    spark.catalog.clearCache() // what Bench/Verify do between queries
    // read the VALUE column: a bare count() would let column pruning drop
    // the UDF projection entirely once the cache is gone
    assert(m.agg(sum("v")).head().getLong(0) == (0L until 1000L).sum,
      "post-release read must recompute from lineage")
    assert(acc.value == 2000L,
      "the recompute should have re-run the producer exactly once more")
  }

  test("eager returns the same rows as the uncached plan") {
    val df = spark.range(100)
      .select(col("id"), (col("id") * 3 % 7).as("k"))
    val m = Materialize.eager(df)
    assert(m.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    spark.catalog.clearCache()
  }
}
