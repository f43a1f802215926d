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
    * The heavy intermediates — the two-regex clean + tokenize, the lowercase
    * tokenize, the punctuation scrub, and the per-language marker scores —
    * are materialized ONCE as named columns and every signal derives from
    * those attributes. Inlining each signal independently (the naive
    * `withColumn(sig, f(text))` form) re-derives the clean/tokenize chain
    * per signal, and langId's argmax CASE duplicates its vocabulary subtree
    * ~2×#langs times; Catalyst's CollapseProject keeps multiply-referenced
    * non-cheap aliases as-is, so this shape evaluates each regex/split
    * exactly once per row (was the slowest registered query at sf0.1, >2×
    * saved).
    */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val parts = df
      .withColumn("__clean_toks",
        TextFunctions.tokens(graft.functions.CleanFunctions.cleanText(t)))
      .withColumn("__lc_toks", TextFunctions.tokens(lower(t)))
      .withColumn("__n_punct", TextFunctions.punctCount(t))
      .withColumn("__vocab", array_distinct(col("__clean_toks")))
    // one marker intersect per language, materialized so the argmax CASE
    // chain references cheap attributes instead of duplicated subtrees
    val scored = TextFunctions.langMarkers.foldLeft(parts) { case (d, (lang, ws)) =>
      d.withColumn(s"__s_$lang", TextFunctions.langScore(col("__vocab"), ws))
    }
    scored
      .withColumn("lang_pred", TextFunctions.langArgmax(
        TextFunctions.langMarkers.map { case (lang, _) => lang -> col(s"__s_$lang") }))
      // whitespace split is case-insensitive, so lowercase tokens count the same
      .withColumn("n_tokens", size(col("__lc_toks")))
      .withColumn("quality", TextFunctions.qualityScoreFromParts(
        size(col("__lc_toks")),
        col("__n_punct"),
        TextFunctions.stopwordCountFromTokens(col("__lc_toks")),
        length(t)))
      // exact-integer 4-dp rounding — the gradeable/exportable form
      // (double round() tie behavior is engine-specific; quality keeps
      // the raw value for thresholds)
      .withColumn("quality_4dp", TextFunctions.qualityScoreRoundedFromParts(
        size(col("__lc_toks")),
        col("__n_punct"),
        TextFunctions.stopwordCountFromTokens(col("__lc_toks")),
        length(t)))
      .withColumn("fp", TextFunctions.fingerprintFromTokens(col("__clean_toks")))
      .drop("__clean_toks", "__lc_toks", "__n_punct", "__vocab")
      .drop(TextFunctions.langMarkers.map { case (lang, _) => s"__s_$lang" }: _*)
  }

  /** Signal-based keep/drop predicate. */
  def keep(cfg: Config): Column =
    col("lang_pred").isin(cfg.langs.toSeq: _*) &&
      col("quality") >= cfg.minQuality &&
      col("n_tokens").between(cfg.minTokens, cfg.maxTokens)

  /** Full pass: annotate → filter → exact-dedup by content fingerprint
    * (first doc id wins, deterministic). Returns the surviving rows with
    * their signals.
    */
  def curate(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val annotated = annotate(df, textCol).filter(keep(cfg))
    Dedup.firstRowByKey(annotated, Seq("fp"), Seq(col(idCol)))
  }
}
