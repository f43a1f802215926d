package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data assembly operators beyond curation (Curation.scala): the
  * steps that turn a curated document pool into model-ready shards —
  * deterministic train/val/test splits, token-budgeted sequence packing,
  * PII redaction, benchmark decontamination, calendar gap-fill for
  * time-series features, and latest-wins snapshot upserts for incremental
  * corpus refreshes. The reference pipeline stops at a FAISS index
  * (ai_powered_financial_analysis.py:354-438); these are the operations the
  * same corpus needs on the way into an LLM training run, designed Spark-
  * first for the 100-TB case.
  */
object TrainingData {

  /** Deterministic content-addressed split assignment: bucket by the first
    * hex character of md5(id) — 16 buckets, split by bucket ranges (12/2/2
    * → 75% train, 12.5% val, 12.5% test). Pure per-row map (no shuffle, no
    * seed state); any engine that can compute md5 reproduces the exact
    * membership, so the split survives re-runs, engine swaps, and
    * incremental appends (a new doc's split never depends on what else is
    * in the corpus).
    */
  def assignSplit(df: DataFrame, idCol: String): DataFrame = {
    val bucket = substring(md5(col(idCol).cast(StringType).cast(BinaryType)), 1, 1)
    df.withColumn("split",
      when(bucket < "c", "train").when(bucket < "e", "val").otherwise("test"))
  }

  /** Token-budgeted sequence packing: assign each document (ordered by
    * `idCol` within `groupCol`) to the pack holding its starting token
    * offset — `pack_id = floor(tokens_before / capTokens)`, the contiguous-
    * chunking form of packing (documents stay whole; a pack's payload may
    * finish past the cap and the next doc starts the next pack region).
    *
    * 100-TB shape: the naive form is one window per group — a group's
    * entire corpus through a single task, which dies at scale. This
    * implementation is a distributed prefix-sum (scan): range-partition by
    * (group, id), compute per-partition per-group token subtotals (tiny:
    * #partitions × #groups rows to the driver), prefix-sum those into
    * per-partition offsets, then add a window that only ever sorts WITHIN
    * one range partition (bounded by partition size, not group size). The
    * result is bit-identical to the global per-group window because range
    * partitioning preserves the total (group, id) order across partitions.
    */
  def packSequences(
      docs: DataFrame, idCol: String, groupCol: String, tokenCol: String,
      capTokens: Long, numPartitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = docs.select(
      col(groupCol).cast(StringType).as("__g"),
      col(idCol).cast(LongType).as("__id"),
      col(tokenCol).cast(LongType).as("__tok"))
    // materialized once (ids + token counts only — a few bytes per row):
    // both the subtotal pass and the final window read this frame, and
    // the eager persist pins ONE set of range boundaries for both (the
    // cached plan's range partitioner is fixed at job submission and
    // reused by any lineage recompute — fault-tolerant, unlike the
    // lineage-severing localCheckpoint this replaced; round-9 chaos)
    val ranged = graft.operators.Materialize.eager(base
      .repartitionByRange(parts, col("__g"), col("__id"))
      .withColumn("__pid", spark_partition_id()))
    // stage 1: per-(partition, group) subtotals — #partitions × #groups
    // rows, safe to collect
    val subtotals = ranged.groupBy("__pid", "__g")
      .agg(sum(col("__tok")).as("__sub"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // driver-side exclusive prefix sum over partition ids, per group
    val offsets: Seq[(Int, String, Long)] = subtotals.keys.map(_._2).toSeq.distinct.flatMap { g =>
      val pids = subtotals.keys.filter(_._2 == g).map(_._1).toSeq.sorted
      var acc = 0L
      pids.map { p =>
        val o = (p, g, acc)
        acc += subtotals((p, g))
        o
      }
    }
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", "__g", "__off")
    // stage 2: local exclusive cumsum within the range partition + the
    // group's offset into it; the window partition is (pid, group) so its
    // sort never exceeds one range partition
    val w = Window.partitionBy(col("__pid"), col("__g")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(offsetDf), Seq("__pid", "__g"))
      .withColumn("__before", col("__off") + coalesce(sum(col("__tok")).over(w), lit(0L)))
      .select(
        col("__id").as(idCol), col("__g").as(groupCol),
        col("__tok").as(tokenCol),
        floor(col("__before") / capTokens).as("pack_id"))
  }

  /** PII redaction: replace e-mail addresses, North-American phone shapes,
    * and SSN-shaped digit groups with typed placeholder tags, and count
    * each kind (audit columns a compliance pass needs). Pure per-row
    * regexes — codegen'd, no shuffle, linear at any scale.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(emailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(phoneRe), lit(0))))
      .withColumn("n_ssns", size(regexp_extract_all(t, lit(ssnRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailRe, "<EMAIL>"),
            ssnRe, "<SSN>"),
          phoneRe, "<PHONE>"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * character n-gram with an evaluation set. The contamination join is a
    * LEFT SEMI join on the shingle — the eval side's distinct shingle set
    * is orders of magnitude smaller than the corpus (an eval suite is a
    * FIXED benchmark set, bounded by construction), so it is broadcast and
    * the probe stays a single narrow map-side pass over the training
    * shingles; matched doc_ids are then de-duplicated by the semi join
    * itself (no row explosion reaches the output).
    *
    * The broadcast is an EXPLICIT hint (round 20): Spark's own size
    * estimate of the exploded+distinct eval side grows past
    * autoBroadcastJoinThreshold with the corpus, and the r20 sf10 plan
    * audit caught the join silently flipped to SortMergeJoin — the full
    * train shingle set (137.6M rows at sf10) exchanged AND sorted on a
    * 20-char string key, the exact large-side shuffle the semi-join
    * design exists to avoid; at cluster scale that shuffle is O(corpus)
    * network while the broadcast probe moves only the bounded eval set.
    * Measured at sf10 local[32] the two shapes are within noise (20.6 s
    * broadcast vs 15.9-28.6 s SMJ across repeats — local shuffle is
    * memory/page-cache, so the network term the hint removes is invisible
    * locally); at sf0.1/sf1 the hint is a no-op (the estimate already
    * broadcasts). Callers with a genuinely unbounded right side should
    * pass `broadcastEval = false` and accept the shuffle.
    *
    * The shingle join key here is the raw n-gram string so external
    * engines can reproduce the exact semantics; at 100 TB you'd hash the
    * shingle first (xxhash64) to shrink shuffle/broadcast width — identical
    * membership, 8-byte keys.
    */
  def contaminatedDocIds(
      train: DataFrame, eval_ : DataFrame, idCol: String, textCol: String,
      n: Int = 20, broadcastEval: Boolean = true): DataFrame = {
    // the explode fans each doc into ~|text| shingle rows BEFORE any
    // exchange — on a single-row-group source that generation runs on one
    // core (round-14 serial-scan finding). widenPlan widens exactly that
    // case: the higher-order transform/substring generator counts as
    // costly row work, and an input that already shuffles passes through
    // unprobed (this method accepts arbitrary frames)
    def shingles(df: DataFrame): DataFrame =
      graft.operators.Shuffle.widenPlan(
          df.select(col(idCol), lower(col(textCol)).as("__t"))
            .filter(length(col("__t")) >= n))(
        _.select(col(idCol),
          explode(expr(s"transform(sequence(1, length(__t) - ${n - 1}), i -> substring(__t, i, $n))"))
            .as("shingle")))
    val evalShingles = shingles(eval_).select("shingle").distinct()
    val buildSide =
      if (broadcastEval) broadcast(evalShingles) else evalShingles
    shingles(train)
      .join(buildSide, Seq("shingle"), "left_semi")
      .select(idCol).distinct()
  }

  /** Calendar gap-fill + forward fill: densify a (key, day, value) series
    * onto the full day spine between the series' global min and max day,
    * carrying the last observed value forward (0 before the first
    * observation). The spine is tiny (days × keys only after the cross
    * join) and broadcast; the fill is one bounded window per key.
    */
  def gapFillDaily(
      series: DataFrame, keyCol: String, dayCol: String,
      valCol: String): DataFrame = {
    val bounds = series.agg(
      min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val spine = bounds.select(
      explode(expr(s"sequence(__lo, __hi, interval 1 day)")).as(dayCol))
    val keys = series.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(spine))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(series, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(last(col(valCol), ignoreNulls = true).over(w), lit(0L)).as(valCol))
  }

  /** Latest-wins snapshot upsert: merge an updates batch into a base
    * snapshot by key — updates replace base rows with the same key, new
    * keys append (the incremental-refresh MERGE a periodically re-crawled
    * corpus needs, expressed storage-agnostically). One shuffle on the
    * key: union the version-tagged sides and keep the max-version row per
    * key. Equivalent to FULL OUTER + coalesce but survives multi-batch
    * generalization (version becomes the batch epoch).
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    val tagged = base.withColumn("__v", lit(0))
      .unionByName(updates.withColumn("__v", lit(1)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__v", "__rn")
  }

  /** Overlapping fixed-size text chunking — the retrieval-granularity
    * step between curation and embedding (a 100-page filing embeds as
    * ~500-char chunks, not one vector). Pure integer arithmetic + one
    * generator explode per row, no shuffle: chunk i covers
    * [i·stride, i·stride + chunkChars) with stride = chunkChars − overlap;
    * a document shorter than one chunk yields exactly one chunk.
    */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int = 200, overlap: Int = 50): DataFrame = {
    require(overlap < chunkChars, s"overlap=$overlap must be < chunkChars=$chunkChars")
    val stride = chunkChars - overlap
    // nChunks = 1 + ceil((len - chunkChars)/stride) for len > chunkChars —
    // typed Columns (no SQL-string splicing, so column names needing
    // backtick quoting work). Column `/` is a double divide, then the Long
    // cast truncates: exact here because the numerator < 2^31 << 2^52 and
    // a non-multiple quotient sits ≥ 1/stride from any integer while the
    // division's rounding error is < numerator·2^-52
    val extra = greatest(lit(0L),
      ((length(col(textCol)).cast(LongType) - chunkChars + (stride - 1))
        / stride).cast(LongType))
    df.withColumn("chunk_idx",
        explode(sequence(lit(0L), extra)))
      .withColumn("chunk_text",
        substring(col(textCol), (col("chunk_idx") * stride + 1).cast(IntegerType),
          lit(chunkChars)))
      .withColumn("chunk_chars", length(col("chunk_text")))
  }

  /** Deterministic per-group downsampling to a common budget — the corpus
    * REMIX step: every group (language, source, domain) is cut to the
    * weight budget of the smallest group, so the mixed corpus is balanced
    * without a seed or a shuffle-order dependence. Membership is content-
    * addressed (first 4 hex chars of md5(id) → a bucket in [0, 65536);
    * keep iff bucket < floor(65536 · target / groupTotal), all-integer
    * arithmetic) — any engine reproduces the exact kept set, and re-runs
    * are bit-stable. Appends move the data-derived threshold smoothly
    * (kept membership under a PINNED threshold is fully append-stable —
    * a doc's bucket never changes). The smallest group's total weight
    * must stay below 2^63/65536 ≈ 1.4e14 (the threshold multiply is
    * guarded — beyond that, pre-scale the weight unit).
    *
    * Two aggregates over group totals (tiny), one broadcast join back,
    * then a pure per-row filter — no per-group windows, nothing collected.
    */
  def remixToBudget(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String): DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast(LongType).as("__total"))
    val target = totals.agg(min(col("__total")).as("__target"))
    val thr = totals.crossJoin(broadcast(target))
      .select(col(groupCol),
        // integer DIV keeps the threshold exact (a double divide would
        // round past 2^53 total weight); the multiply is overflow-guarded
        // rather than silently wrapping to a drop-everything threshold
        expr("CASE WHEN __target > 140737488355327L " + // 2^63 / 65536
          "THEN CAST(raise_error('remixToBudget: target weight overflows the 65536-bucket threshold; pre-scale weightCol') AS BIGINT) " +
          "ELSE __target * 65536 DIV __total END").as("__thr"))
    val bucketHex = substring(md5(col(idCol).cast(StringType).cast(BinaryType)), 1, 4)
    df.join(broadcast(thr), Seq(groupCol))
      .withColumn("__bucket", conv(bucketHex, 16, 10).cast(LongType))
      .filter(col("__bucket") < col("__thr"))
      .drop("__bucket", "__thr")
  }
}
