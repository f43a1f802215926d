package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/** Lexicon sentiment scorer — fills the reference's claimed-but-absent
  * sentiment capability (README.md:42 claims ~85% accuracy; SURVEY §1.4(5)
  * found no backing code). Deterministic, codegen-friendly column
  * expressions: score = (pos_hits − neg_hits) / tokens, clamped to [-1, 1],
  * with a categorical label at ±0.05.
  */
object Sentiment {

  val positive: Seq[String] = Seq(
    "gain", "gains", "growth", "profit", "profits", "surge", "rally",
    "up", "beat", "beats", "strong", "record", "high", "bull", "bullish",
    "good", "great", "positive", "soar", "soars", "win", "wins", "rise", "rises")

  val negative: Seq[String] = Seq(
    "loss", "losses", "drop", "drops", "fall", "falls", "down", "miss",
    "weak", "low", "bear", "bearish", "bad", "negative", "crash", "plunge",
    "plunges", "decline", "declines", "fear", "risk", "cut", "cuts", "slump")

  private def hits(c: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(TextFunctions.tokens(lower(c)), t => array_contains(arr, t)))
  }

  /** Signed score in [-1, 1]. */
  def score(c: Column): Column = {
    val n = TextFunctions.tokenCount(c).cast(DoubleType)
    val raw = when(n > 0,
      (hits(c, positive) - hits(c, negative)).cast(DoubleType) / n)
      .otherwise(lit(0.0))
    greatest(lit(-1.0), least(lit(1.0), raw))
  }

  /** Categorical label: positive / negative / neutral. */
  def label(c: Column): Column = labelOf(score(c))

  /** Label from an already-computed score column — callers that emit both
    * score and label should alias the score in an inner projection and
    * derive the label from the alias, so the tokenize+lookup battery runs
    * once per row structurally (not merely via codegen subexpression
    * elimination, which an interpreted fallback would lose). */
  def labelOf(s: Column): Column =
    when(s > 0.05, "positive").when(s < -0.05, "negative").otherwise("neutral")
}
