package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Deduplication operator family (SURVEY.md §2.1 O19 generalized to the
  * LLM-data-pipeline north star: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup).
  *
  * Scale design: every method here is shuffle-bounded by keys or buckets —
  * there is no all-pairs comparison anywhere. Exact dedup is one hash
  * shuffle on the key; MinHash/SimHash candidate generation joins only
  * within LSH buckets (band signatures), so cost is Σ|bucket|² over small
  * buckets, not |corpus|²; verification runs only on candidate pairs.
  * At 100 TB the shuffle key (band hash) is uniform by construction, so no
  * salting is needed; AQE handles residual bucket skew.
  */
object Dedup {

  /** O19 deterministic form — keep exactly one row per key, chosen by an
    * explicit tiebreak ordering (the reference's `dropDuplicates(["Ticker",
    * "Name"])`, py:244, keeps an arbitrary row; tests and oracles need a
    * pinned winner). One shuffle on `keys`.
    *
    * Deliberately a window, NOT `min(struct(tiebreak, full row))` — the
    * aggregate form looks scale-friendlier (map-side combine) but
    * measured WORSE on both axes that matter (round 14, SCALE.md): a
    * struct-typed min buffer is not a fixed-width hash-agg buffer, so
    * codegen falls back to ObjectHashAggregate (9.2 → 13.2 s on 6M
    * near-unique keys at sf1, where partial combine also finds nothing
    * to combine), and the aggregate does not preserve the child's
    * bucketed output partitioning the way WindowExec does, so the
    * zero-Exchange bucketed as-of plan (q178) grows a shuffle. The
    * window's per-partition sort is the radix-friendly fast path.
    */
  def firstRowByKey(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup on a text column: group by md5(text), keep the
    * smallest id. Returns (keeper_id, dup_count, h). Hash-groupBy = one
    * shuffle on a 128-bit uniform key; partial aggregation (map-side
    * combine) makes this linear at any scale.
    */
  def exactText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
      .select("keeper_id", "dup_count", "h")

  // ---------------------------------------------------------------- MinHash

  /** (doc_id, shingle) pairs — distinct word n-grams over cleaned text.
    * TextFunctions.shingles already dedups within a document, so no
    * cross-row distinct (and no shuffle) is needed here.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    // width-guarded: clean+tokenize+shingle+explode runs at source width
    // (narrow-layout hazard; no-op on a well-split source)
    graft.operators.Shuffle.ensureMinScanWidth(df)
      .select(col(idCol).as("doc_id"), explode(TextFunctions.shingles(col(textCol), n)).as("sh"))

  /** MinHash signatures via the AGGREGATE form (groupBy doc, 32 partial
    * mins over the exploded shingles). Retained as the bit-compatibility
    * oracle for the map-only kernel (DedupSpec asserts equality); the
    * production path is [[minhashNearDups]], whose signature stage is the
    * shuffle-free `TextHashExpressions.minhashSigs` kernel.
    */
  def minhashSignatures(shingles: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("sh"), lit(i))).as(s"mh$i"))
    shingles.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** End-to-end MinHash+LSH near-dup candidates with exact-Jaccard
    * verification of candidates only (the standard two-phase design:
    * cheap recall-oriented banding, then precise filtering on the
    * candidate set — never on the full corpus). The shingle explode feeds
    * the signature aggregation directly (min is duplicate-insensitive, so
    * no full-corpus distinct shuffle); per-doc shingle counts for the
    * Jaccard denominator are computed for candidate docs only.
    *
    * Band-bucket population is BOUNDED (see [[bandedCandidatePairs]]):
    * buckets up to `maxBandPop` members pair all-vs-all as classic LSH;
    * an oversized bucket — a near-dup mega-cluster of templated text,
    * which survives upstream exact dedup and would otherwise make one
    * bucket's |bucket|²/2 pair generation dominate the whole job —
    * switches to a chain window (each member paired with its
    * `chainWidth` successors in doc_id order), linear in bucket size.
    *
    * Recall note: for clusters whose pairwise similarity sits NEAR
    * `minJaccard`, the residual misses (isolated members in SCALE.md's
    * marginal-cluster measurement) are LSH banding misses — pairs whose
    * signatures collide in no band — identical in bounded and unbounded
    * arms. They are tuned via `bands`/`numHashes` (more bands at fewer
    * rows each raises the candidate probability at the threshold), not
    * via `maxBandPop`/`chainWidth`, which only bound pair generation
    * inside buckets that already collided.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5,
      maxBandPop: Int = 256, chainWidth: Int = 8): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rows = numHashes / bands
    // signature stage is PURE MAP: the kernel computes all components from
    // the per-row shingle array — no corpus-wide explode, no groupBy
    // shuffle, no shingle cache to manage (the aggregate form shuffled
    // |corpus| × shingles-per-doc rows just to reduce them back per doc)
    // width-guarded: the shingle+minhash kernel is pure map directly above
    // the scan (narrow-layout hazard; no-op on a well-split source)
    val sigs = graft.operators.Shuffle.ensureMinScanWidth(df)
      .select(col(idCol).as("doc_id"),
        graft.expressions.TextHashExpressions
          .minhashSigs(TextFunctions.shingles(col(textCol), n), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val bandCols = (0 until bands).map { b =>
      xxhash64(((0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)) :+ lit(b)): _*)
    }
    val banded = sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val cands = bandedCandidatePairs(banded, maxBandPop, chainWidth)
    // the shingle EXPLODE now happens only for verification, and
    // jaccardOnPairs prunes it to candidate docs via leftsemi first
    jaccardOnPairs(cands, shingleSet(df, idCol, textCol, n))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Candidate (da, db) pairs from a banded signature frame
    * (doc_id, band, bh), with per-bucket pair generation BOUNDED — the
    * MinHash analog of the IVF join's `targetCellPop` cap, closing the
    * engine's last unbounded-quadratic path.
    *
    * Buckets with ≤ `maxPop` members keep the classic LSH all-pairs
    * self-join (Σ pop² over small buckets ≤ maxPop · corpus — linear).
    * An OVERSIZED bucket is, at 4-row bands, near-certainly one near-dup
    * mega-cluster (templated/boilerplate documents — the common web-scale
    * case; random band-hash collisions at 64 bits cannot populate a
    * bucket): pairing all its members is wasted verification, so each
    * member instead pairs with (a) the bucket REPRESENTATIVE (its
    * smallest doc_id) and (b) its `chainWidth` successors in doc_id
    * order — (chainWidth+1)·pop pairs, linear in bucket size. Downstream
    * exact-Jaccard verification still filters every emitted pair, so
    * precision is unaffected.
    *
    * Recall contract for oversized buckets: any two members within
    * `chainWidth` chain steps get a DIRECT candidate pair; farther pairs
    * are connected through the representative star (candidate-graph
    * diameter 2 — deliberately shallow, because the standard consumer,
    * `Clusters.connectedComponents`, converges in diameter rounds and a
    * chain-only graph would hand it a pop/chainWidth-hop component),
    * with the chain as fallback connectivity should some member-vs-
    * representative verification fail (full cluster membership then
    * still needs no run of `chainWidth` consecutive chain links to all
    * fail — improbable inside a genuine near-dup cluster). Callers
    * needing exhaustive pair-level output at any bucket size raise
    * `maxPop`, accepting the quadratic cost knowingly.
    *
    * Shuffle shape: the rank/population window shuffles on (band, bh) —
    * the same key the candidate join already shuffled on — and the chain
    * probes equi-join on (band, bh, rn), so no new shuffle key appears
    * and AQE still handles residual bucket skew below the cap.
    */
  private[graft] def bandedCandidatePairs(
      banded: DataFrame, maxPop: Int, chainWidth: Int): DataFrame = {
    require(maxPop > 0 && chainWidth > 0,
      s"maxPop=$maxPop and chainWidth=$chainWidth must be positive")
    // Uncapped fast path: with maxPop = Int.MaxValue no bucket can be
    // "oversized", so the generic plan below degenerates to (all-pairs
    // self-join) ∪ (empty) — but still pays the rank/population window's
    // exchange+sort and the planned-but-empty star/chain subtree. The
    // exhaustive gates (q33/q56) lift the cap exactly to pin pair-level
    // recall, so give them the plan they mean: bucket self-join +
    // cross-band distinct, nothing else. Provably identical output
    // (DedupSpec pins fast == generic on colliding fixtures); r20 A/B at
    // sf0.1: q56's banded arm 1.74 → 0.94 s.
    if (maxPop == Int.MaxValue) {
      return banded.as("a")
        .join(banded.as("b"), col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    }
    val bucket = Window.partitionBy("band", "bh")
    val ranked = banded
      .withColumn("pop", count(lit(1)).over(bucket))
      .withColumn("rn", row_number().over(bucket.orderBy("doc_id")).cast(LongType))
    val small = ranked.filter(col("pop") <= maxPop)
    val smallPairs = small.as("a")
      .join(small.as("b"), col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val big = ranked.filter(col("pop") > maxPop)
    // rn is doc_id-ordered within the bucket, so probing rn 1 (the
    // representative star) and rn+1..rn+chainWidth (the chain) yields
    // da < db by construction; the star target is rn=1 so every member's
    // probe set is {1} ∪ (rn+1..rn+chainWidth} minus itself
    val probes = big.filter(col("rn") > 1 || col("rn") < col("pop"))
      .select(col("band"), col("bh"), col("doc_id").as("__src"), col("rn").as("__srcRn"),
        explode(array_union(
          array(lit(1L)),
          when(col("rn") < col("pop"),
            sequence(col("rn") + 1, least(col("rn") + lit(chainWidth.toLong), col("pop"))))
            .otherwise(array().cast(ArrayType(LongType))))).as("rn"))
      .filter(col("rn") =!= col("__srcRn"))
    val bigPairs = probes
      .join(big.select(col("band"), col("bh"), col("doc_id").as("__dst"), col("rn")),
        Seq("band", "bh", "rn"))
      // rank-based self-exclusion (rn =!= __srcRn) is not id-based: with
      // duplicate doc_id rows inside one bucket, least/greatest would emit
      // (x,x) pairs that the small-bucket a.doc_id < b.doc_id predicate
      // excludes — and jaccard(x,x)=1.0 would sail through verification
      .filter(col("__src") =!= col("__dst"))
      .select(least(col("__src"), col("__dst")).as("da"),
        greatest(col("__src"), col("__dst")).as("db"))
    smallPairs.unionByName(bigPairs).distinct()
  }

  /** Restrict (doc_id, sh) rows to docs appearing in `pairs`. */
  private def shinglesOfCandidates(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    val candDocs = pairs
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct()
    shingles.join(candDocs, Seq("doc_id"), "leftsemi")
  }

  /** Exact n-gram Jaccard for given candidate pairs, driven FROM the pairs:
    * each pair pulls in only its two docs' shingles (pair → shingles →
    * matching shingles), so the intersection join is bounded by
    * |pairs| × shingles-per-doc — never the all-pairs shared-shingle
    * explosion. This is what makes LSH banding actually pay off at scale:
    * a naive shingles⋈shingles-then-filter would recompute the full
    * intersection matrix and discard most of it.
    */
  def jaccardOnPairs(pairs0: DataFrame, shingles: DataFrame): DataFrame = {
    // both intermediates are CANDIDATE-bounded (pairs, and the shingles of
    // candidate docs) and each feeds 2-3 downstream sub-plans; eager
    // materialization stops the band self-join and the corpus shingle
    // explode from re-executing per reference — without it the candidate
    // plan ran ~4× (measured 3× slowdown at sf0.1). Materialize.eager
    // (persist + count), NOT localCheckpoint: lineage survives, so an
    // executor death recomputes the lost partitions instead of failing
    // the query (the round-9 chaos finding — see Materialize's scaladoc).
    val pairs = Materialize.eager(pairs0)
    val candSh = Materialize.eager(shinglesOfCandidates(pairs, shingles))
    val counts = candSh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val inter = pairs
      .join(candSh.as("sa"), col("da") === col("sa.doc_id"))
      .join(candSh.as("sb"), col("db") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("da") === col("ca.doc_id"))
      .join(counts.as("cb"), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"),
        (col("inter").cast(DoubleType) /
          (col("ca.c") + col("cb.c") - col("inter"))).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard restricted to docs matching `docFilter` — the
    * DuckDB-oracle-checkable form (shared-shingle equi-join, so cost is
    * bounded by shingle collision counts, and the caller bounds the doc
    * set). Production callers use `minhashNearDups`.
    */
  def ngramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.05): DataFrame =
    // the shingle set feeds three sub-plans; with the single-pass shingle
    // kernel the recompute is cheap scan+map work, and NOT materializing
    // keeps the declarative plan intact (filter pushdown visible, Catalyst
    // free to reuse the exchange)
    ngramJaccardOnShingles(shingleSet(df, idCol, textCol, n), minJaccard)

  /** Same, over a prebuilt (doc_id, sh) set — callers that also run the
    * MinHash path can share one (cached) shingle explode between both.
    */
  def ngramJaccardOnShingles(sh: DataFrame, minJaccard: Double): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    sh.as("x")
      .join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.as("ca"), col("da") === col("ca.doc_id"))
      .join(counts.as("cb"), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"),
        (col("inter").cast(DoubleType) /
          (col("ca.c") + col("cb.c") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens of cleaned text: each token's
    * xxhash64 votes ±1 per bit position; the signature bit is 1 where the
    * vote sum is positive. ONE map-only codegen kernel over the per-row
    * token array — no explode, no 64-aggregate groupBy shuffle (that wide
    * aggregation was both the largest shuffle of the simhash path and the
    * round-2 bench's codegen-compile suspect).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // width-guarded: clean+tokenize+simhash kernel is pure map directly
    // above the scan (narrow-layout hazard; no-op on a well-split source)
    graft.operators.Shuffle.ensureMinScanWidth(df)
      .select(
      col(idCol).as("doc_id"),
      graft.expressions.TextHashExpressions.simhash(
        TextFunctions.tokens(graft.functions.CleanFunctions.cleanText(col(textCol))))
        .as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash via the AGGREGATE form (explode + 64 conditional sums) —
    * retained as the bit-compatibility oracle for the kernel (DedupSpec
    * asserts equality).
    */
  private[graft] def simhashAgg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(graft.functions.CleanFunctions.cleanText(col(textCol)))).as("tok"))
    val h = xxhash64(col("tok"))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))).as(s"b$i")
    }
    val votes = toks.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates are generated by banding the 64-bit
    * signature into 4 × 16-bit blocks (pigeonhole: any pair with hamming
    * distance ≤ 3 shares at least one exact block), then verified by full
    * hamming distance. Equi-join on (block_idx, block_value) — bucket-local,
    * with per-bucket pair generation BOUNDED exactly like the MinHash
    * path ([[bandedCandidatePairs]]): a simhash mega-cluster (near-
    * identical templated docs → identical signatures → the same four
    * block buckets) would otherwise make one bucket's |bucket|²/2 pair
    * generation dominate; past `maxBucketPop` it switches to the linear
    * star+chain window, and hamming verification still filters every
    * emitted pair.
    */
  def simhashNearDups(
      sig: DataFrame, maxHamming: Int = 3,
      maxBucketPop: Int = 256, chainWidth: Int = 8): DataFrame = {
    val blocks = (0 until 4).map(i =>
      shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sig.select(col("doc_id"),
      posexplode(array(blocks: _*)).as(Seq("band", "bh")))
    val cands = bandedCandidatePairs(banded, maxBucketPop, chainWidth)
    val sigs = sig.select(col("doc_id"), col("simhash"))
    cands
      .join(sigs.as("sa"), col("da") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        hamming(col("sa.simhash"), col("sb.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- Embedding cosine

  /** Embedding-cosine near-dup pairs over a bounded id range — the
    * oracle-checkable brute-force form. The scale path is
    * [[cosineNearDupsLsh]], which buckets by hyperplane signs first.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val a = df.select(col(idCol).as("va"), col(vecCol).as("ea"))
    val b = df.select(col(idCol).as("vb"), col(vecCol).as("eb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        graft.functions.VectorFunctions.cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Embedding-cosine near-dup at scale: random-hyperplane LSH. Each of
    * `tables` signature tables hashes a vector to `bits` sign bits of
    * seeded random projections; vectors sharing a signature in ANY table
    * become candidates (equi-join within buckets — never all-pairs), then
    * exact cosine verifies. High-cosine pairs collide with probability
    * (1 - θ/π)^bits per table; more tables raise recall, more bits cut
    * candidate volume.
    *
    * `bits = 0` (the default) sizes the tables from the MEASURED corpus:
    * with fixed bits the expected bucket population is n/2^bits, so
    * candidate volume grows ~n²/2^bits — quadratic in disguise. Auto
    * picks bits ≈ log2(n/16) (expected population ~16) and then raises
    * `tables` to hold the recall of the validated small operating point
    * (bits=12, tables=6) at THIS minCos: per-table collision is p^bits
    * with p = 1 − arccos(minCos)/π, so T = ln(1−R₀)/ln(1−p^bits)
    * tables restore R₀ = 1−(1−p^12)^6 — the standard LSH bits/tables
    * co-scaling that keeps total candidate work near-linear. Exact
    * duplicates (identical direction → identical signatures) collide
    * with probability 1 at ANY sizing. Below 64k vectors auto is
    * bit-identical to the historical (12, 6) point. Measured at sf10
    * (200k vectors, q53): 57.9 → 16.8 s warm with the verified output
    * unchanged (SCALE.md round 15).
    */
  def cosineNearDupsLsh(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCos: Double, bits: Int = 0, tables: Int = 0, seed: Long = 42L,
      maxBucketPop: Int = 256, chainWidth: Int = 8): DataFrame = {
    val (bitsEff, tablesEff) =
      if (bits > 0) (bits, if (tables > 0) tables else 6)
      else {
        // one narrow count (id column only) — the probe that makes the
        // sizing data-dependent instead of a constant that stops scaling
        val n = df.count()
        if (n <= (1L << 16)) (12, if (tables > 0) tables else 6)
        else {
          val b = math.min(24, math.max(12,
            math.ceil(math.log(n / 16.0) / math.log(2.0)).toInt))
          val p = 1.0 - math.acos(math.min(1.0, minCos)) / math.Pi
          val r0 = 1.0 - math.pow(1.0 - math.pow(p, 12), 6)
          val tNeeded =
            math.ceil(math.log(1.0 - r0) / math.log(1.0 - math.pow(p, b))).toInt
          val t = math.min(32, math.max(6, tNeeded))
          // the 32-table cap bounds candidate volume, but at large n and
          // moderate minCos the T that restores the validated (12, 6)
          // operating point's recall exceeds it (e.g. minCos=0.9 at
          // bits=24 needs ~41 tables) — the R0 restore contract then no
          // longer holds, and silently degraded recall is the one failure
          // a caller cannot see from the output. Say so. (r15 advice)
          if (tNeeded > 32)
            org.slf4j.LoggerFactory.getLogger(Dedup.getClass).warn(
              s"cosineNearDupsLsh auto-sizing: restoring the validated recall at " +
                s"minCos=$minCos, bits=$b needs $tNeeded tables; clamped to 32 — " +
                s"recall runs below the documented R0 operating point. Raise " +
                s"`tables` explicitly or lower `bits` to trade candidate volume " +
                s"for recall.")
          (b, if (tables > 0) tables else t)
        }
      }
    val rnd = new scala.util.Random(seed)
    // tables × bits seeded hyperplanes, carried as ONE reference object in
    // a single codegen'd kernel (all tables' sign bits in one pass over the
    // vector; a per-plane literal-array dot would inline tables × bits × dim
    // float literals into the generated Java and take seconds to compile).
    // The kernel throws on a dim mismatch — a silently-degenerate constant
    // signature would collapse the candidate join to all-pairs. Signatures
    // are table-tagged longs, so cross-table values never equi-join and the
    // shuffle key is 8 bytes instead of a bit-string.
    val planes = Array.fill(tablesEff, bitsEff)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // signatures only — the vectors are NOT carried through the ×tables
    // explode (that would amplify the corpus `tables`-fold through the
    // shuffle); candidates join them back by id for verification.
    // Width-guarded: the tables×bits×dim kernel runs directly above the
    // scan (below the bucket join's exchange), so a compacted single-
    // row-group vector table would sign the whole corpus in 1-2 tasks
    // (audit-caught at sf10; no-op on a well-split source).
    val sigs = graft.operators.Shuffle.ensureMinScanWidth(df)
      .select(col(idCol).as("doc_id"),
      explode(graft.expressions.QuantizerExpressions.hyperplaneSigs(col(vecCol), planes)).as("sig"))
    // same per-bucket population bound as the MinHash/SimHash bands: a
    // mega-cluster of (near-)identical vectors lands in the same sig
    // bucket in every table, and the unbounded self-join would go
    // quadratic in cluster size. The sig is already table-tagged, so it
    // alone is the bucket key (band carries no extra information here).
    val banded = sigs.select(col("doc_id"), lit(0).as("band"), col("sig").as("bh"))
    val cands = bandedCandidatePairs(banded, maxBucketPop, chainWidth)
      .select(col("da").as("va"), col("db").as("vb"))
    val vecs = df.select(col(idCol).as("doc_id"), col(vecCol).as("__v"))
    cands
      .join(vecs.as("x"), col("va") === col("x.doc_id"))
      .join(vecs.as("y"), col("vb") === col("y.doc_id"))
      .select(col("va"), col("vb"),
        graft.functions.VectorFunctions.cosine(col("x.__v"), col("y.__v")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
