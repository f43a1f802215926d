package graft.plans

import graft.{Queries, SparkSpec, TestSpark}

/** Scale-plan audit (the 100-TB design gate): scans must prune columns and
  * push filters; top-k must be TakeOrderedAndProject (bounded heaps), not a
  * global sort; aggregations must have a partial (map-side) phase; the
  * nation join must broadcast.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(q: String): String =
    Queries.all(q)(spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("q15: scan prunes to the two projected columns") {
    val p = plan("q15_truncate")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("lang") && !scanLine.contains("n_chars"), scanLine)
  }

  test("q22: doc_id range filter is pushed into the parquet scan") {
    val p = plan("q22_ngram_jaccard")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,200)]")
      || p.contains("LessThan(doc_id,200)"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("q18: single-query top-k is TakeOrderedAndProject, no global sort") {
    val p = plan("q18_topk_l2")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), p) // no full sort node
  }

  test("q29: aggregation has a partial (map-side combine) phase") {
    val p = plan("q29_agg_pushdown")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q31: nation join is broadcast, not shuffled") {
    val p = plan("q31_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: full-table order-by output goes through a range exchange (parallel sort)") {
    val p = plan("q01_scan_project")
    assert(p.contains("rangepartitioning") || p.contains("Exchange rangepartitioning"), p)
  }

  test("q109: decontamination probes a BROADCAST semi join (no corpus-side shuffle for the join)") {
    val p = plan("q109_decontam")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q107: sequence packing windows are bounded by the range partition (no whole-group sort)") {
    // the window must partition by (__pid, __g) — the range-partition id —
    // never by the group alone (a per-group window serializes a whole
    // language through one task at scale)
    val p = plan("q107_pack_sequences")
    assert(p.contains("__pid"), p)
  }

  test("q120: sub-threshold dimension plans as BroadcastHashJoin with no fact-side shuffle") {
    val out = Queries.all("q120_broadcast_gate")(spark, TestSpark.sf0001)
      .select("bhj", "fact_unshuffled").distinct().collect()
    assert(out.length == 1 && out(0).getBoolean(0) && out(0).getBoolean(1))
  }
}
