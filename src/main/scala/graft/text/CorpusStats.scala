package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Corpus-level statistical text scoring — the model-free analogs of the
  * perplexity/divergence filters an LLM data pipeline runs before
  * training (the reference's text analysis stops at NER, reference
  * ai_powered_financial_analysis.py:348-352).
  *
  * Numeric portability is designed in: every score accumulates in exact
  * integer space (per-token quantities quantized ONCE via floor, then
  * summed as BIGINT — addition order cannot change the result) and
  * converts to double with a single final division, so an external engine
  * recomputes the same bits.
  */
object CorpusStats {

  /** (doc_id, token) exploded view of non-empty docs — whitespace
    * tokenization (TextFunctions.tokens contract). The source is
    * width-guarded: the tokenize+explode runs directly above the scan
    * (no exchange below the first aggregate), so a compacted single-
    * row-group corpus would explode ~86M tokens in ONE task at sf10
    * (the narrow-layout hazard, audit-caught sixth sighting; the guard
    * is a no-op on any source that already grants parallelism).
    */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Shuffle.ensureMinScanWidth(docs)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("__tok"))

  /** Per-document average unigram surprisal under an add-1-smoothed
    * corpus unigram LM: surprisal(t) = ln((N + V) / (count(t) + 1)),
    * quantized to integer micro-nats per token; a document's score is
    * mean micro-nat surprisal / 1e6. High = rare/implausible tokens (the
    * cheap stand-in for model perplexity in quality filtering); low =
    * stopword-heavy boilerplate.
    *
    * Two aggregates (corpus token counts; per-doc sum) and one
    * broadcast-friendly equi-join of tokens to counts. N and V are exact
    * driver longs, both derived from ONE aggregate over the pinned
    * vocabulary frame: N = Σ counts and V = |vocab|, so the tokenize
    * battery runs twice (counts build + join side), not three times plus
    * two count jobs — the vocab pin is bounded by distinct-token
    * cardinality, never by corpus volume (measured at sf10, 500k docs:
    * 27-30 → ~17-19 s; the exploded token view itself stays unpinned —
    * pinning IT would be corpus-scale state for one saved regex pass).
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    val counts = graft.operators.Materialize.eager(
      toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt")))
    val nv = counts.agg(sum(col("__cnt")), count(lit(1))).head()
    val n = if (nv.isNullAt(0)) 0L else nv.getLong(0) // null sum = empty corpus
    val v = nv.getLong(1)
    toks.join(counts, "__tok")
      .withColumn("__surp",
        floor(lit(1000000.0) *
          log(lit((n + v).toDouble) / (col("__cnt") + lit(1L)).cast(DoubleType)))
          .cast(LongType))
      .groupBy(col(idCol))
      .agg(
        (sum(col("__surp")).cast(DoubleType) /
          (count(lit(1)) * lit(1000000L)).cast(DoubleType)).as("avg_surprisal"),
        count(lit(1)).as("n_tokens"))
  }

  /** Total-variation distance between the token distributions of two
    * document groups: TV = ½ Σ_t |p_a(t) − p_b(t)|. Computed entirely in
    * integer space over the common denominator N_a·N_b —
    * Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) — so the result is one exact
    * division. 0 = identical distributions, 1 = disjoint vocabularies;
    * the standard drift gate between a new crawl and the reference
    * corpus. One row out: (group_a, group_b, n_a, n_b, tv).
    */
  def tokenTvDistance(docs: DataFrame, groupCol: String, textCol: String,
      groupA: String, groupB: String): DataFrame = {
    // same width guard as tokenized: the explode runs at source width
    val toks = graft.operators.Shuffle.ensureMinScanWidth(docs)
      .filter(col(groupCol).isin(groupA, groupB) && length(trim(col(textCol))) > 0)
      .select(col(groupCol).as("__g"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
    val perTok = toks.groupBy(col("__tok")).agg(
      sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("cb")).cache()
    try {
      // totals first (tiny aggregate), then the exact integer numerator
      val totals = perTok.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")).head()
      require(!totals.isNullAt(0) && totals.getLong(0) > 0,
        s"tokenTvDistance: group '$groupA' has no tokens")
      require(!totals.isNullAt(1) && totals.getLong(1) > 0,
        s"tokenTvDistance: group '$groupB' has no tokens")
      val (na, nb) = (totals.getLong(0), totals.getLong(1))
      // cross products in DECIMAL(38,0): ca·nb approaches na·nb, which
      // overflows Long once both corpora pass ~3e9 tokens — silent Long
      // wrap-around would be exactly the corruption this design rules out
      val dec = DecimalType(38, 0)
      val num = perTok
        .agg(sum(abs(col("ca").cast(dec) * lit(nb) - col("cb").cast(dec) * lit(na))))
        .head().getDecimal(0)
      val spark = docs.sparkSession
      import spark.implicits._
      Seq((groupA, groupB, na, nb,
        num.doubleValue() / (2.0 * na.toDouble * nb.toDouble)))
        .toDF("group_a", "group_b", "n_a", "n_b", "tv")
    } finally perTok.unpersist()
  }
}
