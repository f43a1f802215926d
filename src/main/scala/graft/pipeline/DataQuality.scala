package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Declarative data-quality audit (Deequ-style) computed in ONE aggregate
  * pass per table — the pre-ingest contract check a 100-TB pipeline runs
  * before accepting a batch. Every metric is an ordinary Catalyst aggregate
  * (count/min/max/conditional count), so the whole rule set costs one scan
  * + one partial-aggregate shuffle regardless of how many rules there are;
  * never one job per rule.
  *
  * The reference's only quality practice is a write-then-count read-back
  * (reference ai_powered_financial_analysis.py:301-302); this generalizes
  * it into machine-checkable constraints.
  */
object DataQuality {

  /** One metric per rule, tall format: (metric, value). All metrics are
    * doubles; booleans as 0/1 makes threshold-gating uniform downstream.
    */
  case class Rule(name: String, agg: Column)

  /** Completeness of `c`: fraction of non-null rows. */
  def completeness(c: String): Rule =
    Rule(s"completeness_$c",
      count(col(c)).cast(DoubleType) / count(lit(1)).cast(DoubleType))

  /** Uniqueness of a key: 1.0 iff no two rows share it. Exact distinct —
    * at 100 TB swap in approx_count_distinct with a tolerance band.
    */
  def uniqueness(cols: Seq[String]): Rule =
    Rule(s"uniqueness_${cols.mkString("_")}",
      countDistinct(struct(cols.map(col): _*)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType))

  /** Fraction of rows inside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range_$c",
      sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType))

  /** Fraction of rows whose `c` matches the anchored regex. */
  def matchesPattern(c: String, regex: String): Rule =
    Rule(s"pattern_$c",
      sum(when(regexp_like(col(c), lit(regex)), 1L).otherwise(0L)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType))

  def minOf(c: String): Rule = Rule(s"min_$c", min(col(c)).cast(DoubleType))
  def maxOf(c: String): Rule = Rule(s"max_$c", max(col(c)).cast(DoubleType))
  def rowCount: Rule = Rule("n_rows", count(lit(1)).cast(DoubleType))

  /** Run all rules in a single aggregate pass; returns tall
    * (metric: string, value: double) rows sorted by metric. Typed-Column
    * construction throughout — no SQL-string splicing, so rule names with
    * spaces/quotes (from quoted source columns) can't break the parse.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "DataQuality.audit: no rules given")
    val aggs = rules.map(r => r.agg.as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(rules.map { r =>
        // backtick-quote, escaping embedded backticks (rule names inherit
        // whatever characters the source column carried)
        val quoted = "`" + r.name.replace("`", "``") + "`"
        struct(lit(r.name).as("metric"), col(quoted).as("value"))
      }: _*)).as("e"))
      .select(col("e.metric"), col("e.value"))
      .orderBy("metric")
  }

  /** Referential-integrity violation count: rows of `fact` whose `fk` has
    * no match in `dim.pk`. Left anti join — one shuffle (or none when the
    * dimension broadcasts); null FKs are not violations (SQL FK semantics).
    */
  def orphanCount(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
    fact.filter(col(fk).isNotNull)
      .join(dim.select(col(pk).as("__pk")).distinct(),
        col(fk) === col("__pk"), "left_anti")
      .count()
}
