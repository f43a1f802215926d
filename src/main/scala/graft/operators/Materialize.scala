package graft.operators

import org.apache.spark.sql.DataFrame

/** Fault-tolerant eager materialization barrier.
  *
  * For a deterministic intermediate that feeds several downstream
  * sub-plans (candidate pairs, range-partitioned prefix-sum input), the
  * engine needs ONE computation shared by all consumers — not one
  * re-execution per reference. `localCheckpoint(eager = true)` gives
  * that, but it severs lineage: its blocks live only on the executors
  * that computed them, and an executor death makes the WHOLE query fail
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND instead of recomputing a few
  * partitions. The round-9 chaos harness surfaced exactly that — q84's
  * IVF candidate materialization died under an executor SIGKILL that
  * every lineage-backed query survived (tools/run_chaos.sh).
  *
  * `eager` keeps the reuse without the fragility: persist (memory,
  * spilling to disk) + a count() action fills the cache once, every
  * consumer reads the cached blocks, and a lost block is recomputed
  * from lineage — Spark's native recovery, required at 1000-executor
  * scale where preemption is routine, not exceptional. Determinism
  * holds under partial recompute because the cached plan's shuffle
  * dependencies pin their partitioners (a range partitioner's sampled
  * boundaries are fixed at job submission and reused by stage retries).
  *
  * Lifetime: entries register in the session CacheManager; the harness
  * mains (Bench/Verify/ScaleBench) clear the catalog cache per query,
  * and long-lived callers release via `spark.catalog.clearCache()` —
  * the same contract the previous checkpoint blocks effectively had.
  * The one site where localCheckpoint remains CORRECT is a
  * non-replayable source (q174's live HTTP fetch): there, recompute
  * must never re-run, so lineage truncation is the semantics.
  */
object Materialize {
  def eager(df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    p
  }
}
