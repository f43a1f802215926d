package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical data-layout operators — the storage-side levers that decide
  * whether a 100-TB scan reads 100 TB or 100 GB.
  *
  * The reference persists its corpus as unclustered single-file dumps
  * (reference ai_powered_financial_analysis.py:296-311); at scale the two
  * layout problems that dominate are (a) multi-dimensional access — queries
  * filter on TWO columns but a sort can only cluster one — and (b) small-file
  * proliferation from incremental appends. `zorderWrite` solves (a) with a
  * Morton-curve interleave (the technique behind Delta/Iceberg Z-ORDER
  * clustering); `compact` solves (b) with size-targeted bin-packing.
  */
object Layout {

  /** Morton (Z-order) value of two bucket indices, each in [0, 2^bits).
    * Interleaves the bits — x in even positions, y in odd — so points close
    * in BOTH dimensions land close on the 1-D curve. Pure column arithmetic
    * (shifts + masks), stays inside whole-stage codegen.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    // interleave weight 1L << (2*k + 1) reaches the Long sign bit at
    // k = 31 — beyond 31 bits per dimension the curve silently corrupts
    require(bits >= 1 && bits <= 31, s"zValue: bits=$bits must be in [1, 31]")
    (0 until bits).map { k =>
      shiftright(x, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
        shiftright(y, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))
    }.reduce(_ + _)
  }

  /** Linear bucketization of a numeric column onto [0, 2^bits) given the
    * column's [lo, hi] range. Clamped at both ends so out-of-range values
    * (late data beyond the sampled range) still land in a valid bucket.
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(lit((1L << bits) - 1),
      greatest(lit(0L), floor((c.cast("double") - lit(lo)) / lit(span) * lit(n)).cast(LongType)))
  }

  /** Z-order clustered write: bucketize both cluster columns, interleave to
    * a Morton value, range-partition and sort on it, write parquet. Every
    * output file then covers a tight (c1, c2) tile, so each file's parquet
    * min/max footer stats form a small bounding box in BOTH dimensions —
    * a box filter on either or both columns skips all non-intersecting
    * files instead of just the files of one sorted dimension.
    *
    * The column ranges come from one O(1) aggregate over the input (at real
    * scale: a sample or table-level stats). `files` sizes the output; at
    * 100 TB this is total-bytes / target-file-size, not a constant.
    *
    * Returns the (lo1, hi1, lo2, hi2) ranges that aggregate measured —
    * callers that derive range-aligned predicates (q129's bucket-boundary
    * box) reuse them instead of re-running the identical min/max pass
    * over the table they just clustered (one full scan saved per write;
    * None when the input was empty/all-null and written as-is).
    */
  def zorderWrite(df: DataFrame, path: String, c1: String, c2: String,
      bits: Int = 8, files: Int = 16): Option[(Double, Double, Double, Double)] =
    zorderFrameWithRanges(df, c1, c2, bits, files) match {
      case Some((frame, ranges)) =>
        frame.write.mode("overwrite").parquet(path)
        Some(ranges)
      case None =>
        df.write.mode("overwrite").parquet(path)
        None
    }

  /** The clustered frame [[zorderWrite]] persists — Morton value derived,
    * range-partitioned into `files`, sorted within partitions, `__z`
    * dropped. Exposed so measurement harnesses can execute the EXACT
    * compute plan (scan → z-value → range shuffle → sort) against a noop
    * sink, separating compute from parquet-encode + disk I/O. None for an
    * empty / all-null-cluster-column input (no range to bucketize over —
    * callers write the input as-is).
    */
  def zorderFrame(df: DataFrame, c1: String, c2: String,
      bits: Int = 8, files: Int = 16): Option[DataFrame] =
    zorderFrameWithRanges(df, c1, c2, bits, files).map(_._1)

  /** [[zorderFrame]] plus the measured (lo1, hi1, lo2, hi2) column ranges
    * the bucketization used — the single range aggregate feeds both the
    * Morton derivation and any caller-side range arithmetic.
    */
  def zorderFrameWithRanges(df: DataFrame, c1: String, c2: String,
      bits: Int = 8, files: Int = 16)
      : Option[(DataFrame, (Double, Double, Double, Double))] = {
    val r = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) None
    else {
      val z = zValue(
        bucketize(col(c1), r.getDouble(0), r.getDouble(1), bits),
        bucketize(col(c2), r.getDouble(2), r.getDouble(3), bits), bits)
      Some((df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z"),
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    }
  }

  /** Number of data files under `path` (parquet/orc parts, not _SUCCESS). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith("part-")
    }
  }

  /** Total bytes of data files under `path`. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
  }

  /** Tuned parquet write: per-column bloom filter + explicit compression
    * codec. At 100 TB the bloom filter turns point-lookup scans on a
    * non-sort column into row-group skips (complementing min/max stats,
    * which only help on clustered columns), and the codec choice trades
    * CPU for the dominant I/O cost. Options are plain writer options —
    * no custom output format.
    */
  def writeTunedParquet(df: DataFrame, path: String, bloomCol: String,
      compression: String = "zstd", expectedNdv: Long = 100000L): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol", expectedNdv.toString)
      .parquet(path)

  /** Inspect EVERY data file's footer for `column`: (codec names,
    * bloom-filter present, min/max statistics present) across all row
    * groups — the write-side contract check that tuned options actually
    * reached the files. Files with zero row groups are skipped: Spark
    * legitimately emits empty part files for empty partitions (observed
    * at the sf1 scale run, where the alphabetically-first part-00000
    * carried 0 rows and a first-file-only probe reported the whole
    * dataset untuned), and an empty file has no chunks to carry a codec,
    * bloom, or stats — it cannot violate the contract. Footer reads are
    * O(files) driver work against footer bytes only, fine for a gate
    * over a bounded output; at fleet scale, sample.
    */
  def parquetColumnInfo(spark: SparkSession, path: String,
      column: String): (Set[String], Boolean, Boolean) = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName).map(_.getPath)
    val cols = files.flatMap { file =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      try reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == column).toSeq
      finally reader.close()
    }
    val codecs = cols.map(_.getCodec.name).toSet
    val bloom = cols.nonEmpty && cols.forall(_.getBloomFilterOffset >= 0)
    val stats = cols.nonEmpty && cols.forall { c =>
      val st = c.getStatistics
      st != null && !st.isEmpty && st.hasNonNullValue
    }
    (codecs, bloom, stats)
  }

  /** Minimal atomic commit protocol — the transaction-log kernel under
    * Delta/Iceberg, reduced to its essence: data lands in a per-version
    * directory, and the version becomes VISIBLE only when its marker file
    * appears in `_commits/` (an O(1) atomic create, after all data files
    * are fully written). Readers list markers, not data directories — a
    * torn write (data present, marker absent: job died mid-write) is
    * invisible rather than half-read.
    *
    * Concurrent writers are serialized by a per-version CAS: each writer
    * stages its data in a unique temp dir, then claims a version number
    * with an exclusive `_claims/<v>` create (O_CREAT|O_EXCL — the one
    * atomic test-and-set plain filesystems offer; Hadoop `rename` is NOT
    * a CAS on local disks, it silently overwrites). A loser bumps to the
    * next version and re-claims — its data is never rewritten, only the
    * final metadata rename moves. A writer that dies after claiming
    * leaves a gap in the version sequence (claim without marker), which
    * readers never see because visibility comes from `_commits/` alone.
    */
  object CommitLog {

    private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Atomic create-if-absent, true iff THIS caller created the file.
      * On HDFS-like stores `create(p, overwrite=false)` is atomic at the
      * namenode; on the local filesystem Hadoop's implementation is an
      * exists()-then-open check-then-act with a TOCTOU window, so local
      * paths go through NIO `Files.createFile` (O_CREAT|O_EXCL — a real
      * kernel-level CAS). Without this split, two same-host committers
      * racing inside the window could both "win" the same version.
      */
    private def tryExclusiveCreate(f: org.apache.hadoop.fs.FileSystem,
        p: org.apache.hadoop.fs.Path): Boolean =
      if (f.getScheme == "file") {
        try { java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try { f.create(p, false).close(); true }
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                     _: java.nio.file.FileAlreadyExistsException => false }
      }

    /** Write `df` as the next free version; returns the committed
      * version. Safe under concurrent committers — no external lock.
      */
    def commit(spark: SparkSession, table: String, df: DataFrame): Int =
      commitFrom(spark, table, df, None)

    /** [[commit]] with an injectable starting probe version — the version
      * a writer believes is next after its (possibly stale) read of
      * `latestVersion`. Tests use the override to deterministically
      * reproduce a writer whose read raced a concurrent publish.
      */
    private[storage] def commitFrom(spark: SparkSession, table: String,
        df: DataFrame, startVersion: Option[Int]): Int = {
      import org.apache.hadoop.fs.Path
      val tmp = new Path(table, s"_tmp-${java.util.UUID.randomUUID}")
      val f = fs(spark, tmp)
      df.write.mode("overwrite").parquet(tmp.toString)
      f.mkdirs(new Path(table, "_claims"))
      var v = startVersion.getOrElse(latestVersion(spark, table).getOrElse(-1) + 1)
      var claimed = false
      while (!claimed) {
        if (!tryExclusiveCreate(f, new Path(s"$table/_claims/$v"))) {
          v += 1 // lost the race for this version — try the next slot
        } else if (f.exists(new Path(s"$table/_commits/$v"))) {
          // Won the claim file, but the version is already PUBLISHED: the
          // original claim was GC-reaped after its marker appeared, and
          // this writer's latestVersion read predates that marker. The
          // marker — not the claim — is the immutability source of truth;
          // touching dest here would tear a visible version. Bump past it.
          // (Our resurrected claim file stays behind as marker-backed
          // garbage for a later TTL'd sweep.)
          v += 1
        } else claimed = true
      }
      // chaos failpoint (tools/run_chaos.sh, commit scenario): hold HERE —
      // claim won, nothing renamed, no marker — so the harness can SIGKILL
      // a real writer process at the exact protocol point where death
      // leaves a markerless claim. The sentinel file tells the harness the
      // hold is reached; the process then parks until killed. Inert unless
      // the env var is set.
      sys.env.get("GRAFT_CHAOS_HOLD_AFTER_CLAIM").foreach { sentinel =>
        f.create(new Path(sentinel), true).close()
        Thread.sleep(Long.MaxValue)
      }
      val dest = new Path(s"$table/v$v")
      // a pre-CAS-era torn write could have left an unmarked data dir at
      // this version; it was never visible, and we own the claim — clear
      // it so the rename lands at dest instead of nesting inside it
      if (f.exists(dest)) f.delete(dest, true)
      require(f.rename(tmp, dest), s"CommitLog: rename $tmp -> $dest failed")
      val marker = new Path(s"$table/_commits/$v")
      f.mkdirs(marker.getParent)
      f.create(marker, false).close() // publish: version becomes visible
      // opportunistic, non-fatal: a commit is the natural moment to sweep
      // the garbage contention leaves behind, and GC failure must never
      // fail a successful commit
      try gc(f, new Path(table), v, TmpTtlMs) catch { case _: java.io.IOException => () }
      v
    }

    /** Stale-staging TTL: liveness is judged by the NEWEST mtime anywhere
      * under a `_tmp-*` tree (task commits land files under
      * `_temporary/...`, so the top-level dir's own mtime stays at job
      * start) — an hour with no file activity anywhere in the tree means
      * the writer is dead (a hung one past the TTL fails its rename
      * loudly rather than corrupting anything). The same TTL age-gates
      * marker-backed claim reaping.
      */
    private val TmpTtlMs: Long = 60L * 60 * 1000

    /** Newest modification time anywhere in the tree rooted at `p` —
      * the liveness signal for a staging dir whose writes land in nested
      * `_temporary` task dirs, not at the top level.
      */
    private def treeMaxMtime(f: org.apache.hadoop.fs.FileSystem,
        p: org.apache.hadoop.fs.Path): Long =
      try {
        val self = f.getFileStatus(p).getModificationTime
        f.listStatus(p).foldLeft(self) { (acc, st) =>
          math.max(acc,
            if (st.isDirectory) treeMaxMtime(f, st.getPath) else st.getModificationTime)
        }
      } catch { // raced with the writer's own rename/cleanup: treat as live
        case _: java.io.FileNotFoundException => System.currentTimeMillis()
      }

    /** Sweep commit-protocol garbage that is invisible to readers:
      *  - `_claims/<v>` whose version is PUBLISHED (its `_commits/<v>`
      *    marker exists) and whose claim file is older than `ttlMs`. The
      *    marker requirement keeps a live pre-publish writer's claim safe;
      *    the TTL keeps the slot occupied long enough that any racer whose
      *    `latestVersion` read predated the marker has already probed past
      *    it (and commit()'s marker re-check backstops even that).
      *    Markerless claims are NEVER reaped — they are either a live
      *    writer mid-commit or a dead claimer's permanent tombstone, and a
      *    tombstone is exactly what keeps that torn slot unreachable.
      *  - `_tmp-*` staging dirs whose whole TREE is idle past `ttlMs` —
      *    writers that died before their rename.
      * Without this, claims/tmp dirs accumulate forever and the commit
      * CAS probe degrades to a linear scan under long-lived contention.
      */
    private[storage] def gc(f: org.apache.hadoop.fs.FileSystem,
        table: org.apache.hadoop.fs.Path, latestCommitted: Int, ttlMs: Long): Unit = {
      import org.apache.hadoop.fs.Path
      val cutoff = System.currentTimeMillis() - ttlMs
      val claims = new Path(table, "_claims")
      if (f.exists(claims)) f.listStatus(claims).foreach { st =>
        val v = st.getPath.getName.toIntOption.getOrElse(-1)
        if (v >= 0 && v <= latestCommitted && st.getModificationTime < cutoff &&
            f.exists(new Path(table, s"_commits/$v")))
          f.delete(st.getPath, false)
      }
      f.listStatus(table).foreach { st =>
        if (st.getPath.getName.startsWith("_tmp-") && treeMaxMtime(f, st.getPath) < cutoff)
          f.delete(st.getPath, true)
      }
    }

    /** Highest committed version, None before the first commit. */
    def latestVersion(spark: SparkSession, table: String): Option[Int] = {
      val dir = new org.apache.hadoop.fs.Path(s"$table/_commits")
      val f = fs(spark, dir)
      if (!f.exists(dir)) None
      else f.listStatus(dir).map(_.getPath.getName.toInt)
        .reduceOption(_ max _)
    }

    /** Read the latest COMMITTED version (uncommitted data dirs are
      * invisible). Throws if nothing was ever committed.
      */
    def readLatest(spark: SparkSession, table: String): DataFrame = {
      val v = latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(s"CommitLog: no committed version in $table"))
      spark.read.parquet(s"$table/v$v")
    }
  }

  /** Size-targeted compaction: rewrite a fragmented directory into
    * ceil(totalBytes / targetBytes) files. Uses coalesce (no shuffle —
    * input splits are concatenated, never repartitioned) so compaction
    * cost is one read + one write; at 100 TB this runs per partition of a
    * date-partitioned table, not over the whole table at once. Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): (Int, Int) = {
    val before = dataFileCount(spark, inPath)
    val bytes = dataBytes(spark, inPath)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    (before, dataFileCount(spark, outPath))
  }
}
