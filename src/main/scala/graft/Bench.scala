package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are forced with a noop-format write (full
  * materialization of every column) — `count()` would let Catalyst prune
  * the projected work and flatter the numbers (round-1 verdict item 7).
  */
object Bench {

  /** Replay cutoff: max(2× median of successful first-pass times, 2 s).
    * The 2 s floor keeps small-SF runs (median ~0.1 s) from replaying
    * every structurally-slower query for sub-second stakes; -1 failure
    * sentinels are excluded from the median. Returns +∞ when nothing
    * succeeded (nothing is worth replaying into a broken run).
    */
  def replayThreshold(firstPass: Seq[Double]): Double = {
    val ok = firstPass.filter(_ >= 0).sorted
    if (ok.isEmpty) Double.PositiveInfinity
    else math.max(2.0 * ok(ok.size / 2), 2.0)
  }

  /** Per-query times from the committed prior full record (BENCH_full.json).
    * The record is this main's own output format, so a scoped regex over
    * `"qNN_name":seconds` pairs suffices — serving/meta keys never start
    * with `q<digit>`. Failure sentinels (-1) and an absent file yield no
    * entries (no prior → no second trigger, never an error). Two silent
    * failure modes are made loud or safe (round-10 ADVICE): a prior
    * recorded at a DIFFERENT scale factor is discarded — k×-vs-prior
    * against another SF's times would either replay the whole suite or
    * mask every real regression — and a readable-but-unparseable prior
    * prints a one-line warning instead of indistinguishably disabling
    * the trigger.
    */
  def priorTimes(path: String, expectSf: Option[String] = None): Map[String, Double] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) return Map.empty
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val sfRe = """"sf":"([^"]*)"""".r
      val recordSf = sfRe.findFirstMatchIn(txt).map(_.group(1))
      // a record with NO sf field is treated like a mismatch, not a pass:
      // a legacy/hand-edited prior of unknown scale factor re-opens the
      // exact failure mode this gate closes (k×-vs-prior against another
      // SF's times replays the whole suite or masks every regression)
      val sfMismatch = (expectSf, recordSf) match {
        case (Some(want), Some(got)) => want != got
        case (Some(_), None) => true
        case _ => false
      }
      if (sfMismatch) {
        System.err.println(s"[bench] prior $path is for " +
          s"sf=${recordSf.getOrElse("<unrecorded>")}, " +
          s"current run is ${expectSf.get} — prior-based replay trigger disabled")
        return Map.empty
      }
      val re = """"(q\d+[A-Za-z0-9_]*)":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)""".r
      val parsed = re.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 >= 0).toMap
      if (parsed.isEmpty)
        System.err.println(s"[bench] prior $path exists but yielded no query times " +
          "— prior-based replay trigger disabled")
      parsed
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] prior $path unreadable (${e.getMessage}) " +
        "— prior-based replay trigger disabled")
      Map.empty
    }

  /** Second replay trigger (round-9 verdict item 4): the median-based
    * cutoff has a 2 s absolute floor, which let a 4.6× regression on a
    * 0.4 s query escape replay — an entire contention window can hide
    * under the floor if every query it inflates stays sub-2 s. So any
    * query k× over its own committed prior time also replays, floored at
    * `minSec` so sub-second jitter doesn't replay half the suite.
    * minSec sits at 0.4 s (round-10 tuning: 0.2 s fired 37/179 replays,
    * ~21% of the suite, because box noise regularly doubles a 0.25 s
    * query at sf0.1); the r9 escape case (0.43 s → 1.96 s) still lands
    * above the floor, so the protection the trigger exists for is kept.
    */
  def regressedVsPrior(
      t: Double, prior: Option[Double], k: Double = 2.0, minSec: Double = 0.4): Boolean =
    t >= minSec && prior.exists(p => p > 0 && t > k * p)

  /** Single-thread box-speed probe: a fixed xorshift64* loop (no
    * allocation, no memory traffic — pure scalar ALU). Returns seconds
    * for `steps` iterations, min over `reps` timed runs after one
    * untimed warmup (JIT compilation must not land in a timed rep).
    * The fold into `sink` keeps the loop un-eliminable.
    */
  def jvmCalib(steps: Long = 1L << 29, reps: Int = 3): Double = {
    def once(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var sink = 0L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < steps) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        sink ^= x * 0x2545F4914F6CDD1DL
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (sink == 42L) System.err.println("") // defeat dead-code elim
      dt
    }
    once() // untimed JIT warmup
    (1 to reps).map(_ => once()).min
  }

  /** Disk-write box-speed probe (round 18): the r18 sf10 record's
    * above-median movers were EXACTLY the write-heavy queries (q09
    * dedup-shuffle, q89 sorted write, q129 Z-order, q130 compaction,
    * q156 snapshot rewrites — 1.2-1.4× after dividing out the CPU-uniform
    * inflation), a fingerprint the jvm1/sparkN CPU probes cannot see:
    * the driver provisions a fresh VM per session and its DISK can drift
    * independently of its CPUs. One fixed probe: write `mb` megabytes of
    * incompressible-ish bytes to `dir` in 1 MiB chunks, fsync, delete;
    * min over `reps` after one untimed warmup (repeat-min: contention
    * only inflates). Returns (seconds, effectiveMb), seconds -1 on any
    * failure (diagnostic metadata must never abort the run it
    * annotates). The effective probe size is part of the return — and is
    * stamped into the record's calib block as `diskcal_mb` — because a
    * low-usable-space resize changes what the seconds MEAN: a 16 MB
    * probe's seconds are not comparable to a 256 MB probe's, and a
    * stderr-only resize note left compare_bench.py silently comparing
    * incomparable sizes (ADVICE r19).
    */
  def diskCalib(dir: String = sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp").split(",")(0),
      mb: Int = sys.env.get("SPARK_GRAFT_DISKCAL_MB")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption).filter(_ > 0)
        .getOrElse(256),
      reps: Int = 3): (Double, Int) = {
    // ADVICE r18: the probe writes (reps+1)×mb MB total (peak mb on disk
    // at once); on a nearly-full or tmpfs-backed local dir the default
    // 1 GiB could ENOSPC and degrade to the -1 sentinel, losing the disk
    // fingerprint the write-cluster attribution depends on. Check usable
    // space first and shrink the probe (floor 16 MB — below that fsync
    // latency dominates and the number stops being a bandwidth probe)
    // rather than fail; a resized probe is stamped to stderr because its
    // seconds are NOT comparable across records taken at different sizes.
    val effMb = try {
      val usableMb = java.nio.file.Files
        .getFileStore(java.nio.file.Paths.get(dir)).getUsableSpace >> 20
      // keep the probe ≤ 1/4 of usable space so it cannot meaningfully
      // perturb the shuffle dir the timed run is about to use
      if (usableMb / 4 < mb) math.max(16, (usableMb / 4).toInt) else mb
    } catch { case scala.util.control.NonFatal(_) => mb }
    if (effMb != mb)
      System.err.println(s"[bench] disk calib resized ${mb}->${effMb} MB (low usable space in $dir) — not comparable to full-size disk256 stamps")
    def once(): Double = {
      val f = java.nio.file.Files.createTempFile(java.nio.file.Paths.get(dir), "graft_dcal", ".bin")
      try {
        val chunk = new Array[Byte](1 << 20)
        // xorshift-filled once: constant-byte pages can be cheated by
        // filesystem-level compression/dedup on some hosts
        var x = 0x9E3779B97F4A7C15L
        var i = 0
        while (i < chunk.length) { x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27; chunk(i) = (x >>> 33).toByte; i += 1 }
        val t0 = System.nanoTime()
        val ch = java.nio.channels.FileChannel.open(f,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          var m = 0
          while (m < effMb) { ch.write(java.nio.ByteBuffer.wrap(chunk)); m += 1 }
          ch.force(true)
        } finally ch.close()
        (System.nanoTime() - t0) / 1e9
      } finally java.nio.file.Files.deleteIfExists(f)
    }
    try { once(); ((1 to reps).map(_ => once()).min, effMb) }
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] disk calib probe failed (${e.getMessage}) — recording -1")
      (-1.0, effMb)
    }
  }

  /** Contamination verdict stamped into every record (r17 verdict item 3:
    * attempt-1's rejection relied on a human reading steal_sec — make it
    * policy-in-code so a contaminated raw total can never silently
    * re-enter the series as an anchor). Threshold: 30 CPU-s absolute
    * (the quiet-anchor bar) or 10% of the run's wall total, whichever is
    * larger — the r16 quiet sf0.1 record read 11.2 CPU-s over 213 s
    * (~5%), while every contaminated record on file reads 347-1632
    * CPU-s (>150% of wall). The 10% arm keeps long sf10 runs (1400+ s
    * wall) from tripping on background-noise-level steal that a 30 s
    * absolute bar would flag. A -1 sentinel (steal unreadable,
    * off-Linux) is NOT contaminated — there is no signal either way,
    * and the calib probes still carry the box-speed fingerprint.
    */
  def contaminationVerdict(stealSec: Double, totalSec: Double): Boolean =
    stealSec >= 0 && stealSec > math.max(30.0, 0.10 * totalSec)

  /** Aggregate hypervisor-steal jiffies from /proc/stat's `cpu` row
    * (field 8 after the label: user nice system idle iowait irq softirq
    * STEAL). None off-Linux or on parse failure. The BENCH_sf10_r16c
    * record was inflated by BURSTY steal (a noisy co-tenant VM) that only
    * /proc/stat could attribute — recording the run's steal delta makes
    * that diagnosis part of the record instead of a forensic follow-up.
    */
  def procStatSteal(): Option[Long] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")).filter(_.length > 8).map(_(8).toLong)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Box-wide CPU counters for the per-query contention stamps: (busy,
    * iowait, steal) jiffies from /proc/stat's aggregate `cpu` row, where
    * busy = user+nice+system+irq+softirq (everything ANY process on the
    * box executed). None off-Linux or on parse failure.
    */
  def procStatCpu(): Option[(Long, Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")).filter(_.length > 8).map { f =>
          (f(1).toLong + f(2).toLong + f(3).toLong + f(6).toLong + f(7).toLong,
            f(5).toLong, f(8).toLong)
        }
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** This JVM's own CPU jiffies (utime+stime across all threads — local
    * mode runs every executor in-process, so this is the bench's entire
    * compute) from /proc/self/stat. Parsed after the last ')' because the
    * comm field may contain spaces/parens; utime/stime are overall fields
    * 14/15 (1-based), i.e. indices 11/12 of the post-comm remainder.
    */
  def procSelfBusy(): Option[Long] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
      val rest = txt.substring(txt.lastIndexOf(')') + 2).split(" ")
      Some(rest(11).toLong + rest(12).toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-query external-contention stamp (round-21, VERDICT r20 item 1):
    * CPU-seconds of (steal, iowait, other-process busy) that elapsed
    * INSIDE one query's timed window. `other` = box busy minus this JVM's
    * own busy — the signal the run-global steal stamp is blind to: the
    * r20 driver record carried 8 phantom 2-6× "regressions" on a
    * contiguous q70-q76 stretch while its whole-run steal read 1.5 CPU-s
    * (clean), so whatever inflated that stretch was same-VM contention
    * (another process on the box), not hypervisor steal. Sampling both
    * /proc/stat and /proc/self/stat around each query makes an inflated
    * stretch attributable FROM THE RECORD ALONE: tools/compare_bench.py
    * marks stamped queries `suspect` instead of `regressed`.
    */
  case class ExtStamp(steal: Double, iowait: Double, other: Double) {
    def combined: Double = steal + other // iowait excluded: our own writes cause it
  }

  def extDelta(
      c0: Option[(Long, Long, Long)], s0: Option[Long],
      c1: Option[(Long, Long, Long)], s1: Option[Long]): Option[ExtStamp] =
    for ((b0, i0, st0) <- c0; (b1, i1, st1) <- c1; u0 <- s0; u1 <- s1)
      yield ExtStamp(
        (st1 - st0) / 100.0,
        (i1 - i0) / 100.0,
        math.max(0L, (b1 - b0) - (u1 - u0)) / 100.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE may re-coalesce cached plans (matches EngineSession; see its
      // scaladoc for the measured high-partition persist() cost)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen/scan setup should not be billed to the
    // alphabetically-first query
    try SparkEntry.queries("q01_scan_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // the first string-function execution in a JVM pays ~1.2-1.5 s of lazy
    // collation/codegen class initialization (measured: a ONE-ROW
    // lower(trim(...)) costs 1.48 s cold, 0.01 s warm — r13 bisect of the
    // "q03 8x regression", which was this init landing on the first
    // lower/trim query once the replay-vs-prior rerun stopped masking it).
    // A one-row probe absorbs it here, where setup cost belongs.
    try spark.range(1)
      .select(org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.col("id").cast("string"),
          org.apache.spark.sql.functions.lit(" x ")))).as("v"))
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Box-speed calibration (round 16): records are taken on whatever VM
    // instance the driver provisioned that day, and a fresh instance
    // measured the SAME HEAD a uniform 27% slower wall-to-wall (179-query
    // median per-query ratio 1.27x vs the committed record, 159 worse /
    // 9 better — untouched one-shot queries inflated the most). Totals
    // across rounds are therefore only comparable after dividing out box
    // speed. Two fixed probes, each min-over-3 after an untimed warmup
    // (repeat-min: noise only inflates, so a noisy rep can only be
    // corrected downward):
    //  - jvm1: single-thread xorshift64* loop — pure scalar CPU.
    //  - sparkN: one fixed codegen'd job (range >> xxhash64 >> sum) at
    //    bench parallelism — scheduler + codegen + memory bandwidth.
    // tools/compare_bench.py divides these out when both records carry
    // them and prints the drift fingerprint either way.
    val calibJvm = jvmCalib()
    // guarded like the warmups above: calibration is diagnostic metadata,
    // and an environmental failure in this one fixed job must not abort
    // the 179-query run it exists to annotate (-1 sentinel, matching
    // steal_sec's convention) — ADVICE r16
    val calibSpark = try {
      import org.apache.spark.sql.functions.{sum => fsum, xxhash64, shiftright, col}
      def once(): Double = {
        val t0 = System.nanoTime()
        // shiftright(40) bounds each term under 2^24 so the 2^28-row sum
        // stays under 2^52 — ANSI mode makes a raw hash sum overflow-fatal
        spark.range(1L << 28).select(fsum(shiftright(xxhash64(col("id")), 40)))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // untimed warmup
      (1 to 3).map(_ => once()).min
    } catch { case scala.util.control.NonFatal(e) =>
      // NonFatal only (ADVICE r17): a fatal JVM error (OOM, linkage)
      // during the probe means the JVM is already poisoned — swallowing
      // it as a -1 sentinel would let the 179-query run proceed and
      // contaminate the graded record the probe exists to annotate
      System.err.println(s"[bench] spark calib probe failed (${e.getMessage}) — recording -1")
      -1.0
    }
    val (calibDisk, calibDiskMb) = diskCalib()
    System.err.println(f"[bench] calib: jvm1=$calibJvm%.3f s, spark$cpus=$calibSpark%.3f s, disk256=$calibDisk%.3f s (probe ${calibDiskMb} MB)")
    val stealStart = procStatSteal()
    // name -> stamp for the OBSERVATION whose time the record keeps (a
    // replay that wins the min overwrites the first pass's stamp)
    val extStamps = scala.collection.mutable.Map.empty[String, ExtStamp]
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[ExtStamp]) = {
      val c0 = procStatCpu(); val s0 = procSelfBusy()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // stamp window closes HERE — the cache clearing below is untimed,
      // so its contention cannot be charged to this query's stamp
      val ext = extDelta(c0, s0, procStatCpu(), procSelfBusy())
      // untimed: release caches and localCheckpoint RDDs the query left
      // behind — 73 queries accumulating storage in one 8-16g JVM turn
      // into GC pressure that bills later queries for earlier ones'
      // leftovers (r04: q52 17.3s in-bench vs 6.1s isolated)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // -1 keeps failures machine-detectable in the JSON contract
      (if (ok) elapsed else -1.0, ext)
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t, ext) = run(name, fn)
      ext.foreach(extStamps(name) = _)
      name -> t
    }
    // replay pass: an external contention window (another process pinning
    // the machine for a minute) inflates whichever queries it overlaps and
    // fabricates phantom regressions (r06: five queries 1.5-3x slower in
    // the official record, all at normal speed on same-night replays).
    // Any query slower than the replay cutoff gets one untimed-warm
    // replay; report the min of the two observations — a noisy reading
    // can only be corrected downward, never invented.
    val threshold = replayThreshold(firstPass.map(_._2))
    // read BEFORE this run overwrites BENCH_full.json at the end; the
    // record's own sf field gates it (a stale record from another scale
    // factor must not drive k×-vs-prior comparisons)
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", "BENCH_full.json")
    val prior = priorTimes(priorPath, Some(sfDir))
    // name the armed prior in the record's stderr: a clobbered/mismatched
    // prior silently weakening the replay protocol (r16 finding #3) must
    // be visible in the run log, not a forensic reconstruction
    System.err.println(s"[bench] replay-vs-prior armed with $priorPath " +
      s"(${prior.size} query times)")
    val replayed = scala.collection.mutable.ListBuffer.empty[String]
    val results = firstPass.map { case (name, t) =>
      if (t > threshold || regressedVsPrior(t, prior.get(name))) {
        replayed += name
        val (t2, ext2) = run(name, SparkEntry.queries(name))
        // the stamp follows the kept observation: if the replay wins the
        // min, its contention context is the one the recorded time saw
        if (t2 >= 0 && (t < 0 || t2 < t)) ext2.foreach(extStamps(name) = _)
        name -> (if (t2 >= 0) math.min(t, t2) else t)
      } else name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query contention stamps, full form: [steal, iowait, other]
    // CPU-seconds at 2 dp, sparse (entries whose combined external signal
    // clears 0.02 CPU-s — one jiffy each way is sampling noise). The KEY
    // `qext` being present at all distinguishes "stamped clean" from
    // "legacy record without stamps" in compare_bench.py.
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qext = results.flatMap { case (k, _) =>
      extStamps.get(k).filter(e => e.steal + e.iowait + e.other >= 0.02).map(e =>
        "\"" + k + "\":[" + fmt2(e.steal) + "," + fmt2(e.iowait) + "," + fmt2(e.other) + "]")
    }.mkString("{", ",", "}")
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // The driver keeps only the LAST ~2000 chars of stdout (r07 and r08
    // both lost the head of a single long record line, leaving nothing
    // parseable). The final line must therefore carry all 177 queries in
    // well under that budget — including the ~80 chars of sbt epilogue
    // that land after it. Encoding: keys shrink to the bare query NUMBER
    // (the N of qNN_*; "qunit" documents it), times to integer
    // CENTISECONDS — 10 ms granularity is ample for a backup record; full
    // names + full precision live in BENCH_full.json and on the earlier
    // full line. Measured size at sf0.1: ~1.7 KB with ~200 chars spare.
    def fmtCs(v: Double): String =
      if (v < 0) "-1" else math.round(v * 100).toString
    val shortKeys0 = results.map { case (k, _) =>
      k -> k.drop(1).takeWhile(_.isDigit).dropWhile(_ == '0')
    }.toMap
    // number collision: fall back to full names rather than drop data
    val useShortKeys = shortKeys0.values.toSet.size == results.size
    val shortKeys: Map[String, String] =
      if (useShortKeys) shortKeys0 else results.map { case (k, _) => k -> k }.toMap
    val compactKeyed = results.map { case (k, v) => shortKeys(k) -> v }
    val qsCompact = compactKeyed.map { case (k, v) => "\"" + k + "\":" + fmtCs(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val rep = replayed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // build-once/query-many retrieval (the reference's real usage shape);
    // reported separately so index construction stops masking serving
    // latency — see ServingBench
    val servingRes =
      try Some(ServingBench.run(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] serving failed: ${e.getMessage}")
        None
      }
    val serving = servingRes.map { case (build, mean, max, n, annMean, annMax) =>
      s"""{"build_sec":$build,"warm_query_mean_sec":$mean,"warm_query_max_sec":$max,"n_calls":$n,"ann_warm_mean_sec":$annMean,"ann_warm_max_sec":$annMax}"""
    }.getOrElse("null")
    // compact serving mirror (3 dp) for the size-budgeted last line:
    // b=build, qm/qx=warm query mean/max, am/ax=ANN warm mean/max
    val servingCompact = servingRes.map { case (build, mean, max, n, annMean, annMax) =>
      s"""{"b":${fmt(build)},"qm":${fmt(mean)},"qx":${fmt(max)},"n":$n,"am":${fmt(annMean)},"ax":${fmt(annMax)}}"""
    }.getOrElse("null")
    // full-fidelity record: printed FIRST (its head may be cut from the
    // driver's stdout tail — acceptable, it also persists to a file) and
    // written to BENCH_full.json so no per-query timing is ever lost
    // steal delta over the whole query+serving window, in CPU-seconds
    // (jiffies/USER_HZ=100); -1 when /proc/stat is unavailable
    val stealSec = (for (a <- stealStart; b <- procStatSteal())
      yield (b - a) / 100.0).getOrElse(-1.0)
    // self-labeling record (r17 verdict item 3): the verdict field makes
    // contamination machine-readable in the artifact itself —
    // tools/compare_bench.py refuses a contaminated prior as a series
    // anchor, and a human skimming the JSON sees it without arithmetic
    val contaminated = contaminationVerdict(stealSec, total)
    if (contaminated)
      System.err.println(f"[bench] RECORD CONTAMINATED: steal_sec=$stealSec%.1f " +
        f"CPU-s over a $total%.1f s run exceeds max(30, 10%% of wall) — " +
        "do not anchor the series on this record; re-run when the box is quiet")
    val calib =
      s"""{"jvm1_sec":${fmt(calibJvm)},"spark${cpus}_sec":${fmt(calibSpark)},"disk256_sec":${fmt(calibDisk)},"diskcal_mb":$calibDiskMb,"steal_sec":${fmt(stealSec)},"contaminated":$contaminated}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","replayed":$rep,"calib":$calib,"qext":$qext,"serving":$serving}"""
    println(fullLine)
    // BENCH_full.json is the graded sf0.1 artifact AND the replay-trigger
    // prior; a non-sf0.1 run overwriting it silently degrades both (r16:
    // an sf10 run clobbered it and the graded record replayed 56 queries
    // against no prior). run_bench.sh routes small-SF output to /tmp by
    // convention — enforce it here so a direct `graft.Bench` invocation
    // cannot clobber either.
    val requestedOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    // exact path-component match, not a substring (ADVICE r17: a dir named
    // 'xsf0.1' passed the old endsWith, and a renamed graded dir silently
    // redirected); SPARK_GRAFT_BENCH_FORCE_OUT=1 honors an explicitly-set
    // OUT even off-sf0.1 for deliberate experiments — the silent-clobber
    // protection stays the default
    val isGradedSf =
      java.nio.file.Paths.get(sfDir.stripSuffix("/")).getFileName.toString == "sf0.1"
    val forceOut = sys.env.get("SPARK_GRAFT_BENCH_FORCE_OUT").contains("1")
    val out =
      if (!isGradedSf && !forceOut &&
          java.nio.file.Paths.get(requestedOut).getFileName.toString == "BENCH_full.json") {
        val redirect = s"/tmp/BENCH_${java.nio.file.Paths.get(sfDir.stripSuffix("/")).getFileName}.json"
        System.err.println(s"[bench] $requestedOut is the graded sf0.1 artifact; " +
          s"this run is sf=$sfDir — writing $redirect instead")
        redirect
      } else requestedOut
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // compact self-sufficient record: LAST line out, sized to survive the
    // driver's stdout-tail capture whole (replay list collapses to its
    // count, serving to 3-dp short keys, sf to its numeric suffix)
    val sfShort = sfDir.split("sf").last
    // compact contention stamps: combined (steal + other-process) centi-
    // CPU-s per query, only entries ≥ 25 cs, capped at the 12 largest —
    // a clean run emits "{}" (~10 chars) and even a badly contaminated
    // run stays within the last line's stdout-tail size budget while
    // still naming the inflated stretch (q70-76-class bursts are
    // contiguous; 12 offenders localize them)
    val qxCompact = results.flatMap { case (k, _) =>
      extStamps.get(k).map(e => k -> math.round(e.combined * 100))
    }.filter(_._2 >= 25).sortBy(-_._2).take(12)
      .map { case (k, cs) => "\"" + shortKeys(k) + "\":" + cs }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","qunit":"cs","queries":$qsCompact,"sf":"$sfShort","nreplay":${replayed.size},"cal":{"j":${fmt(calibJvm)},"s":${fmt(calibSpark)},"d":${fmt(calibDisk)},"st":${fmt(stealSec)},"ct":${if (contaminated) 1 else 0}},"qx":$qxCompact,"serving":$servingCompact}"""
    println(line)
    spark.stop()
  }
}
