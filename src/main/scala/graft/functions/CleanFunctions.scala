package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-function library for the cleaning/normalization operator family
  * (SURVEY.md §2.1 O12-O18, O25-O28). Everything here is built from
  * `org.apache.spark.sql.functions._` so it stays inside whole-stage codegen —
  * no UDFs, no driver round-trips, scale-independent.
  */
object CleanFunctions {

  /** O12 — lowercase + trim key normalization (reference py:230-232). */
  def normalizeKey(c: Column): Column = lower(trim(c))

  /** O13 — combined HTML-tag + non-alphanumeric scrub (reference py:234-235).
    * Same Java regex dialect as the reference's PySpark call.
    */
  def scrub(c: Column): Column =
    // one-pass byte-scan kernel, bit-identical to
    // regexp_replace(c, "<[^>]+>|[^a-zA-Z0-9\\s]", "") — same treatment
    // as cleanLowered (see TextScanExpressions; equivalence
    // property-pinned in TextScanExpressionsSpec)
    graft.expressions.TextScanExpressions.scrubTags(c)

  /** O14 — two-pass text clean: lower, strip tags, strip non-alphanumerics
    * (reference py:340-345). Kept as two passes to preserve the reference's
    * semantics (a tag spanning the lowered text is removed before the
    * character scrub).
    */
  def cleanText(c: Column): Column = cleanLowered(lower(c))

  /** [[cleanText]] minus the lowercase pass — for callers that already
    * materialized `lower(c)` and feed it to several signals (see
    * Curation.annotate): the full-string lowercase copy then runs once
    * per row instead of once per consumer.
    *
    * ONE alternation pass, provably identical to the reference's
    * remove-tags-then-scrub two-pass form: both scans attempt `<.*?>`
    * at each position of the SAME original string (replacement never
    * rescans its own output), so the tag-match sets coincide; a failed
    * tag attempt advances one char in either form, after which the
    * char class removes exactly the non-alphanumerics outside tag
    * spans — which is all the second pass ever saw. Equivalence is
    * property-tested against the literal two-pass form
    * (PropertySpec "fused clean"); the fusion halves cleanText's
    * full-document scan+copy cost on every hot path that tokenizes
    * cleaned text (curation, fingerprints, shingles, minhash).
    */
  def cleanLowered(loweredCol: Column): Column =
    // one-pass byte-scan kernel, bit-identical to
    // regexp_replace(loweredCol, "<.*?>|[^a-z0-9\\s]", "") and ~10x
    // cheaper (the regex was HALF the sf10 curation battery — round-17
    // profile in TextScanExpressions' scaladoc; equivalence
    // property-pinned in TextScanExpressionsSpec)
    graft.expressions.TextScanExpressions.cleanScrub(loweredCol)

  /** O16 intended semantics — comma-tolerant numeric parse (SURVEY §1.4(2)):
    * `"559,365,151.11"` parses instead of casting to null. `try_cast` keeps
    * the reference's null-on-malformed behavior under Spark 4's default
    * ANSI mode (a plain cast would throw on the first bad value).
    */
  def parseNumeric(c: Column, to: DataType = DoubleType): Column =
    regexp_replace(c, ",", "").try_cast(to)

  /** O15 intended semantics — default AFTER the cast so cast-failures are
    * also defaulted (fixes SURVEY §1.4(3)).
    */
  def numericWithDefault(c: Column, default: Double, to: DataType = DoubleType): Column =
    coalesce(parseNumeric(c, to), lit(default).cast(to))

  /** O17 — timestamp parse accepting both dialects present in the reference
    * data: `yyyy-MM-dd HH:mm:ss` (generator, reference py:120) and ISO-8601
    * `...T...Z` (shipped reddit_posts.json). The cast handles both under
    * UTC session TZ; `try_cast` nulls malformed inputs instead of failing
    * the job under ANSI mode.
    */
  def parseTimestamp(c: Column): Column = c.try_cast(TimestampType)

  /** O18 intended semantics — string record id (reference py:281-282 used `+`,
    * which is numeric addition in Spark and yields null; SURVEY §1.4(1)).
    */
  def recordId(cols: Column*): Column = concat_ws("_", cols: _*)

  /** O26 — text assembly `title + " " + content` (reference py:365-367). */
  def assembleText(title: Column, content: Column): Column =
    concat_ws(" ", title, coalesce(content, lit("")))

  /** O27 — priority-ordered multi-field document text extraction
    * (reference py:412-422). Null-safe concat of the candidate fields,
    * trimmed; callers filter `length > 0`. Field matching is by caller-supplied
    * column list (case-insensitivity is resolved at the DataFrame layer —
    * SURVEY §1.4(4)).
    */
  def extractText(fields: Seq[Column]): Column =
    trim(concat_ws(" ", fields.map(f => coalesce(f, lit(""))): _*))

  /** O28 — context truncation (reference py:459). 1-based, inclusive. */
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)
}
