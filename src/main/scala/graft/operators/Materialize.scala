package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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

  /** Plan-level (storage-free) pushdown barrier for an expensive-to-derive
    * filter predicate.
    *
    * Catalyst's `PushPredicateThroughNonJoin` substitutes a Filter's
    * attribute references with the child Project's alias expressions and
    * pushes the rewritten predicate down — with NO cost model. A filter
    * over derived signal columns (curation's keep()) therefore re-inlines
    * the ENTIRE derivation into the pushed predicate, which lands below
    * every exchange and re-runs the battery at raw-scan width: measured
    * on the sf1 curation pipeline, annotate 3.6 s but annotate+filter
    * 8.4 s, with the full regex/tokenize battery visible inside the
    * pushed Filter node against the scan.
    *
    * The barrier is a NON-DETERMINISTIC-marked identity UDF over the
    * predicate: pushdown requires a deterministic condition, so the
    * filter stays where it was written and evaluates the signal
    * ATTRIBUTES computed once below. The function is pure — the marking
    * is optimizer-facing only, so retry determinism is untouched — and
    * the per-row cost is one boolean-boundary JVM call. It must be
    * opaque: an always-true `rand() >= 0 && pred` guard measured USELESS
    * because the optimizer folds deterministic-outcome rand comparisons
    * and splits conjunctions, pushing the bare predicate anyway. Null
    * propagates through the UDF's null check, and Filter treats null as
    * false — identical to the unwrapped predicate. Use ONLY when the
    * predicate's inputs are expensive derivations — on plain scans this
    * would defeat parquet filter pushdown, the optimization the rule
    * exists for.
    */
  private lazy val ndIdentity =
    org.apache.spark.sql.functions.udf((b: Boolean) => b).asNondeterministic()
  def noPushdown(pred: Column): Column = ndIdentity(pred)
}
