package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Defer expensive per-row derivation past a query's final sort exchange.
  *
  * The engine's display/export queries share one shape: scan a table,
  * derive expensive per-row columns (JSON/XML parse, regex scrub, HOF
  * suites over tokenized text), and end in a total ORDER BY on a unique
  * key. Written naively that is Scan → Project(expensive) → Exchange →
  * Sort, and the Project runs at the SCAN's parallelism — which is
  * whatever the source layout grants. Parquet assigns a row group to
  * exactly one task (split offsets beyond a row-group midpoint produce
  * empty tasks), so a table written as one file with one row group — the
  * local testdata's layout at every SF, and a routine hazard in real
  * lakes (compacted single-file outputs, oversized row groups) — runs
  * the ENTIRE derivation on one core. Measured at sf1 (1M-row events,
  * one row group): q77's triple from_json parse was 14.2 s and
  * core-count-invariant from local[4] to local[32] — pure serial time.
  *
  * This helper flips the plan: project the sort keys plus the raw input
  * columns (narrow), sort FIRST, and derive AFTER the exchange —
  * Scan → Exchange(range) → Sort → Project(expensive). No new shuffle:
  * the range exchange was already in the plan. The derivation now runs
  * at the sort's width (spark.sql.shuffle.partitions; AQE's
  * parallelism-first coalescing keeps that at or above the core count),
  * independent of the source layout. No optimizer rule re-collapses the
  * Project below the Sort, and ProjectExec preserves its child's output
  * ordering, so the total ORDER BY contract is intact. Measured: q77
  * 14.2 s → 1.35 s at sf1 (with the parse also shared — see below);
  * the restructure beats an explicit repartition(cores) (1.8 s), which
  * pays an extra full shuffle.
  *
  * The trade-off, stated honestly for cluster scale: sorting first
  * shuffles the RAW inputs instead of the derived outputs. When the
  * derivation narrows aggressively (q50 extracts one int from a ~100-B
  * JSON string), a well-laid-out source with parallel scans would
  * shuffle less under derive-first. Defer when the derivation is
  * compute-bound or non-narrowing (every registered use here); keep
  * derive-first when outputs are far smaller than inputs AND the source
  * layout guarantees scan parallelism.
  *
  * Callers that use a derived value more than once should alias it in
  * an inner projection (two selects): CollapseProject's cost check keeps
  * a non-cheap producer that is referenced multiple times in its own
  * Project, so the value is computed once per row — the registered q77
  * parsed its map three times through a single select (14.2 s); one
  * aliased parse is 8.2 s even before the post-sort move.
  */
object SortedDerive {
  /** Sort `df` by `sortCols` over only `sortCols ++ inputs`, then apply
    * `derive` — whose projections execute after the sort exchange. */
  def apply(df: DataFrame, sortCols: Seq[String], inputs: Seq[String])(
      derive: DataFrame => DataFrame): DataFrame = {
    val narrow: Seq[Column] = (sortCols ++ inputs).distinct.map(col)
    derive(df.select(narrow: _*).orderBy(sortCols.map(col): _*))
  }
}
