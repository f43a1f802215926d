package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (north-star extensions over the reference's clean/normalize family,
  * reference ai_powered_financial_analysis.py:340-345, py:412-422).
  *
  * Everything is built from `org.apache.spark.sql.functions._` higher-order
  * and string functions so it stays inside whole-stage codegen: no UDFs, no
  * driver round-trips — each function scales as a pure map over rows.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct lowercase alphanumeric tokens — the "vocabulary" of a doc. */
  def vocab(c: Column): Column =
    array_distinct(tokens(CleanFunctions.cleanText(c)))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: letter runs count 1 each, digits count 1 per
    * digit, punctuation 1 per char — the shape (not the vocab) of byte-pair
    * tokenizers. Regex is RE2/Java-compatible so a DuckDB oracle can mirror
    * it verbatim.
    */
  val bpeishPattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
  def bpeishCount(c: Column): Column = regexp_count(c, lit(bpeishPattern))

  /** Characters the punctuation scrub would remove = punctuation count.
    * regexp_count over the single-char class, NOT
    * `length(c) - length(regexp_replace(c, …, ""))`: the replace form
    * allocates a full scrubbed copy of every document just to measure its
    * length — same result, one matched pass, zero string allocation.
    */
  def punctCount(c: Column): Column =
    // one-pass byte-scan kernel, bit-identical to
    // regexp_count(c, "[^a-zA-Z0-9 ]") — the other half of the sf10
    // curation-battery regex cost (see TextScanExpressions)
    graft.expressions.TextScanExpressions.punctCount(c)

  /** Word n-gram shingles over cleaned text (dedup building block).
    * Empty array when the doc has fewer than n tokens; distinct set
    * (first-occurrence order). One single-pass kernel over the token
    * array — the previous higher-order-function form re-evaluated the
    * tokenize+clean subtree (two regex passes over the document) on every
    * element reference inside the interpreted lambda, ~18 ms/row.
    */
  def shingles(c: Column, n: Int): Column =
    graft.expressions.TextHashExpressions.ngramShingles(
      tokens(CleanFunctions.cleanText(c)), n)

  /** Deterministic document fingerprint: md5 of the two-pass-cleaned,
    * whitespace-collapsed text. Identical content → identical fingerprint,
    * robust to case/punctuation/spacing noise.
    */
  def fingerprint(c: Column): Column =
    fingerprintFromTokens(tokens(CleanFunctions.cleanText(c)))

  /** Fingerprint over precomputed clean tokens. */
  def fingerprintFromTokens(cleanTokens: Column): Column =
    md5(concat_ws(" ", cleanTokens))

  /** 64-bit rolling fingerprint: hash chained over the cleaned token
    * stream (`acc ← xxhash64(acc, token)`). Order-sensitive (unlike a
    * token-set hash) and incremental — the shape used for shift-tolerant
    * chunk fingerprinting. Hash-chaining instead of polynomial arithmetic
    * keeps it ANSI-safe (wrapping long multiply throws under Spark 4's
    * default ANSI mode). Pure column expression.
    */
  def rollingFingerprint(c: Column): Column =
    aggregate(
      tokens(CleanFunctions.cleanText(c)),
      lit(0L),
      (acc, t) => xxhash64(acc, t))

  /** Language-marker table for the heuristic language ID. Deliberately tiny
    * and public-knowledge (function words); the mechanism (marker-hit argmax)
    * is what the engine ships, the tables are configuration.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "pt" -> Seq("o", "a", "de", "que", "e", "os", "um")
  )

  /** Per-language marker-hit score over a precomputed vocabulary column. */
  def langScore(vocabCol: Column, markerWords: Seq[String]): Column =
    size(array_intersect(vocabCol, array(markerWords.map(lit): _*)))

  /** Argmax CASE chain over precomputed per-language score columns: first
    * language (in table order) whose score ties the max and is positive;
    * "und" otherwise. Callers that evaluate many signals per row should
    * materialize the scores as named columns first (see Curation.annotate) —
    * passing raw score expressions here duplicates each score subtree
    * ~2×#langs times in the CASE chain.
    */
  def langArgmax(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), tail) =>
      when(s === maxScore && s > 0, lit(lang)).otherwise(tail)
    }
  }

  /** Heuristic language ID: count distinct marker-word hits per language over
    * the doc vocabulary, predict the first language (in table order) whose
    * score ties the max; "und" when nothing matches. Deterministic and
    * SQL-mirrorable (array_intersect + CASE chain).
    */
  def langId(c: Column, markers: Seq[(String, Seq[String])] = langMarkers): Column = {
    val v = vocab(c)
    langArgmax(markers.map { case (lang, ws) => lang -> langScore(v, ws) })
  }

  /** English stopword list for quality scoring (public knowledge). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Stopword hits (with multiplicity) over precomputed lowercase tokens. */
  def stopwordCountFromTokens(lcTokens: Column): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(lcTokens, t => array_contains(stops, t)))
  }

  /** Stopword hits (with multiplicity) over whitespace tokens. */
  def stopwordCount(c: Column): Column =
    stopwordCountFromTokens(tokens(lower(c)))

  /** Quality blend from precomputed counts (see qualityScore for the
    * formula). nTokCol/punctCol/stopCol/nCharCol may be attribute references
    * to once-materialized columns, keeping the heavy tokenization out of the
    * per-signal expression trees.
    */
  /** Exact integer (numerator, denominator) of the quality blend. The
    * blend's terms are terminating decimals (0.4·min(n/100,1), 0.3·k/n,
    * …), so real scores routinely land EXACTLY on 4-dp round half-way
    * points — a multi-term double accumulation lets two engines land an
    * ulp apart on opposite sides of the tie, and even identical doubles
    * are tie-broken differently by different round() implementations.
    * Keeping the score rational until the last step is what makes it
    * portable. den = 1000·chars·tokens stays far under Long range for
    * any realistic document (overflow needs chars·tokens > 4.6e11).
    */
  def qualityNumDen(nTokCol: Column, punctCol: Column,
      stopCol: Column, nCharCol: Column): (Column, Column) = {
    val nTok = nTokCol.cast(LongType)
    val nChar = nCharCol.cast(LongType)
    // degenerate guards keep the historical semantics: punct ratio 0 when
    // the text is empty, stop ratio 0 when there are no tokens
    val safeChar = when(nChar > 0, nChar).otherwise(lit(1L))
    val punctEff = when(nChar > 0, punctCol.cast(LongType)).otherwise(lit(0L))
    val safeTok = when(nTok > 0, nTok).otherwise(lit(1L))
    val stopEff = when(nTok > 0, stopCol.cast(LongType)).otherwise(lit(0L))
    // the products run in DECIMAL(38,0), not LONG: a multi-MB document can
    // push 20000·chars·tokens past Long range, where Spark legacy math
    // wraps silently while the DuckDB oracle (HUGEINT) keeps going — the
    // decimal headroom (num ≤ ~2e7·chars·tokens < 1e38) makes the exact
    // rational safe for any real document
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val num = d38(least(nTok, lit(100L))) * lit(4) * d38(safeChar) * d38(safeTok) +
      d38(safeChar - punctEff) * lit(300) * d38(safeTok) +
      d38(least(stopEff * lit(5L), safeTok)) * lit(300) * d38(safeChar)
    (num, d38(safeChar) * d38(safeTok) * lit(1000))
  }

  def qualityScoreFromParts(nTokCol: Column, punctCol: Column,
      stopCol: Column, nCharCol: Column): Column = {
    val (num, den) = qualityNumDen(nTokCol, punctCol, stopCol, nCharCol)
    qualityFromNumDen(num, den)
  }

  /** Final step over a PRE-MATERIALIZED exact rational (see
    * Curation.annotate — quality and quality_4dp share one num/den):
    * ONE double division of exact integers, bit-identical in any engine
    * evaluating the same num/den, so threshold compares agree everywhere.
    */
  def qualityFromNumDen(num: Column, den: Column): Column =
    num.cast(DoubleType) / den.cast(DoubleType)

  /** 4-dp exact-integer half-up rounding over a pre-materialized rational
    * (the [[qualityScoreRoundedFromParts]] tail — see that scaladoc for
    * why double round() can't grade this).
    */
  def qualityRoundedFromNumDen(num: Column, den: Column): Column = {
    val r = org.apache.spark.sql.GraftBridge.integralDivide(
      num * lit(20000L) + den, den * lit(2L))
    r.cast(DoubleType) / lit(10000.0)
  }

  /** Quality rounded half-up to 4 dp IN EXACT INTEGER SPACE:
    * r = (20000·num + den) div (2·den), emitted as r/10000.0. Double
    * round() is not portable on ties (engines disagree on which side an
    * ulp-off value falls, and on tie-break direction); integer rounding
    * of the exact rational is. This is the gradeable output form.
    */
  def qualityScoreRoundedFromParts(nTokCol: Column, punctCol: Column,
      stopCol: Column, nCharCol: Column): Column = {
    val (num, den) = qualityNumDen(nTokCol, punctCol, stopCol, nCharCol)
    qualityRoundedFromNumDen(num, den)
  }

  /** Composite quality score in [0,1]: rewards moderate length, low
    * punctuation density, presence of stopwords (prose-likeness). The exact
    * blend is a heuristic; determinism and SQL-mirrorability are the contract.
    * score = 0.4*min(tokens/100,1) + 0.3*(1-punct_ratio) + 0.3*min(stop_ratio*5,1)
    */
  def qualityScore(c: Column): Column =
    qualityScoreFromParts(tokenCount(c), punctCount(c), stopwordCount(c), length(c))

  /** 4-dp exact-rounded form of [[qualityScore]] (see
    * qualityScoreRoundedFromParts for why double round() can't grade this).
    */
  def qualityScoreRounded(c: Column): Column =
    qualityScoreRoundedFromParts(tokenCount(c), punctCount(c), stopwordCount(c), length(c))

  /** Sentence split for the extractive answerer (reference's RAG context is
    * sentence-shaped, py:460). Keeps non-empty trimmed sentences.
    */
  def sentences(c: Column): Column =
    filter(transform(split(c, "[.!?]+"), s => trim(s)), s => length(s) > 0)
}
