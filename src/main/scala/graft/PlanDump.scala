package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries — the artifact of
  * the "audit every plan" discipline (tools/dump_plans.sh → PLANS.md).
  */
object PlanDump {
  // gated queries (q35/q51/…) return a driver-computed summary row whose
  // plan is trivial, so the dump lists the queries whose returned frame IS
  // the distributed pipeline
  val headline: Seq[String] = Seq(
    "q15_truncate", "q18_topk_l2", "q22_ngram_jaccard", "q29_agg_pushdown",
    "q30_window_topn", "q31_join_agg", "q41_asof_join", "q42_range_join",
    "q43_curation", "q44_grouped_topk", "q46_batch_topk", "q53_cosine_lsh",
    "q57_corpus_assembly", "q58_image_decode", "q59_salted_agg",
    "q60_hll_distinct", "q74_grouping_sets", "q75_full_outer",
    "q78_window_range", "q79_exists_subquery", "q81_bucketed_join",
    "q82_salted_join", "q84_ann_join", "q87_asof_exec", "q89_sorted_write",
    "q105_gap_fill", "q107_pack_sequences", "q109_decontam",
    "q119_batch_sessions", "q120_broadcast_gate",
    "q131_runtime_filter", "q133_scd2", "q137_surprisal",
    "q138_tv_distance", "q142_ewma", "q148_bigrams", "q149_funnel",
    "q150_dpp", "q154_batch_session_window", "q157_cdc_apply",
    "q165_twap", "q166_ohlc", "q167_chunking", "q168_vocab_encode",
    "q169_feature_scaling", "q178_asof_bucketed", "q179_imi_join")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // optional trailing args: restrict the dump to the named queries.
    // Names OUTSIDE the headline list are honored too (appended in sorted
    // order) — the scale-factor plan-flip audits dump per-row expression
    // suites (q77/q122/q163/q50) that are deliberately not headliners.
    val only = args.drop(1).toSet
    val selected =
      if (only.isEmpty) headline
      else headline.filter(only) ++ only.diff(headline.toSet).toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // q81 eagerly drops+writes its bucketed tables when the query
      // function is invoked — without this they land in ./spark-warehouse
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    selected.foreach { name =>
      println(s"\n## $name\n")
      println("```")
      val df = SparkEntry.queries(name)(spark, sfDir)
      // formatted explain, trimmed to the operator tree section
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(txt.linesIterator.takeWhile(l => !l.startsWith("===")).mkString("\n").take(4000))
      println("```")
    }
    spark.stop()
  }
}
