package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Shuffle

/** Pins the two plan properties that keep the curation battery
  * single-pass and wide (round 14, SCALE.md): the filterKeep barrier
  * stops Catalyst's filter-through-Project alias substitution from
  * re-inlining the signal battery into the Filter, and
  * ensureMinScanWidth adds a pre-derivation exchange only when the
  * source under-grants parallelism. Results must be identical to the
  * naive forms — the barrier is optimizer-facing only.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
  private val cfg = Curation.Config(langs = Set("en"), minQuality = 0.5, minTokens = 5)

  test("filterKeep result equals the naive filter(keep)") {
    val viaBarrier = Curation.filterKeep(Curation.annotate(docs, "text"), cfg)
      .select("doc_id").orderBy("doc_id").collect()
    val naive = Curation.annotate(docs, "text").filter(Curation.keep(cfg))
      .select("doc_id").orderBy("doc_id").collect()
    assert(viaBarrier.nonEmpty && viaBarrier.toSeq === naive.toSeq)
  }

  test("filterKeep keeps the battery out of the Filter (single evaluation)") {
    // the battery's heavy pass is the clean_scrub kernel (regexp_replace
    // before round 17) — match either spelling so the assertion tracks
    // the battery, not its implementation
    def batteryInFilter(plan: String): Boolean = plan.linesIterator.exists(l =>
      l.contains("Filter") && (l.contains("clean_scrub") || l.contains("regexp_replace")))
    val guarded = Curation.filterKeep(Curation.annotate(docs, "text"), cfg)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!batteryInFilter(plan),
      s"battery re-inlined into the Filter:\n${plan.take(2000)}")
    // control: the naive form DOES re-inline it — if Spark ever grows a
    // cost guard making the barrier unnecessary, this control fails and
    // the barrier can be retired
    val naive = Curation.annotate(docs, "text").filter(Curation.keep(cfg))
    val nplan = naive.queryExecution.executedPlan.toString
    assert(batteryInFilter(nplan),
      "control failed: naive filter no longer re-inlines — barrier may be removable")
  }

  test("ensureMinScanWidth repartitions narrow sources, passes wide ones") {
    val narrow = docs.coalesce(1)
    val widened = Shuffle.ensureMinScanWidth(narrow, 4)
    assert(widened.rdd.getNumPartitions >= 4)
    val alreadyWide = docs.repartition(8)
    val untouched = Shuffle.ensureMinScanWidth(alreadyWide, 4)
    // pass-through: the helper returns the frame unchanged (no extra
    // exchange on top of the existing one)
    assert(untouched eq alreadyWide)
  }
}
