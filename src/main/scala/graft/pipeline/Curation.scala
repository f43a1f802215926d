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

  /** Annotate with the curation signals (pure map — no shuffle). */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("lang_pred", TextFunctions.langId(t))
      .withColumn("n_tokens", TextFunctions.tokenCount(t))
      .withColumn("quality", TextFunctions.qualityScore(t))
      .withColumn("fp", TextFunctions.fingerprint(t))
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
