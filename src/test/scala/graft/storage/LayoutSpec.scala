package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (known Morton values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 8).as("z"))
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)  // x bits land in even positions
    assert(rows((0L, 1L)) == 2L)  // y bits land in odd positions
    assert(rows((1L, 1L)) == 3L)
    // x=3 (011), y=5 (101): interleave -> y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert(rows((3L, 5L)) == 39L)
    assert(rows((255L, 255L)) == 65535L)
  }

  test("zValue rejects bits outside [1, 31] (Long sign-bit overflow guard)") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException](Layout.zValue(col("x"), col("y"), 32))
    intercept[IllegalArgumentException](Layout.zValue(col("x"), col("y"), 0))
    // the max legal width keeps every interleave weight and the sum positive
    val z = df.select(Layout.zValue(col("x"), col("y"), 31).as("z")).head().getLong(0)
    assert(z == 3L)
  }

  test("bucketize clamps to [0, 2^bits) and is monotone") {
    import spark.implicits._
    val df = Seq(-10.0, 0.0, 25.0, 50.0, 99.99, 100.0, 500.0).toDF("v")
      .select(col("v"), Layout.bucketize(col("v"), 0.0, 100.0, 4).as("b"))
    val m = df.collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(m(-10.0) == 0L && m(0.0) == 0L)
    assert(m(100.0) == 15L && m(500.0) == 15L) // clamped at top
    assert(m(25.0) == 4L && m(50.0) == 8L)
    assert(m.values.forall(b => b >= 0 && b < 16))
  }

  test("zorderWrite clusters a 2-D box into few files; content preserved") {
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(7)
    val df = (1 to n).map(i => (i.toLong, rnd.nextInt(10000).toLong, rnd.nextDouble()))
      .toDF("a", "b", "payload").repartition(16)
    val path = "/tmp/graft_test_zorder"
    Layout.zorderWrite(df, path, "a", "b", bits = 8, files = 16)
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    // box aligned to the top-3-bit bucket boundary: [2/8, 3/8) of each range
    val box = back.filter(
      col("a") >= n * 2 / 8 && col("a") < n * 3 / 8 &&
        col("b") >= 10000 * 2 / 8 && col("b") < 10000 * 3 / 8)
    val touched = box.select(input_file_name()).distinct().count()
    val total = Layout.dataFileCount(spark, path)
    assert(total == 16, s"expected 16 files, got $total")
    assert(touched > 0 && touched <= 4, s"box touched $touched of $total files")
    // an unclustered write spreads the same box over every file
    val flatPath = "/tmp/graft_test_zorder_flat"
    df.repartition(16).write.mode("overwrite").parquet(flatPath)
    val flatTouched = spark.read.parquet(flatPath).filter(
      col("a") >= n * 2 / 8 && col("a") < n * 3 / 8 &&
        col("b") >= 10000 * 2 / 8 && col("b") < 10000 * 3 / 8)
      .select(input_file_name()).distinct().count()
    assert(flatTouched > touched * 2, s"flat=$flatTouched zorder=$touched")
  }

  test("zorderWrite tolerates an empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val path = "/tmp/graft_test_zorder_empty"
    Layout.zorderWrite(empty, path, "a", "b")
    assert(spark.read.parquet(path).count() == 0)
  }

  test("CommitLog: versions visible only after their marker; torn writes invisible") {
    import spark.implicits._
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    intercept[IllegalStateException](CommitLog.readLatest(spark, table))
    val v0 = CommitLog.commit(spark, table, Seq((1, "a")).toDF("id", "v"))
    assert(v0 == 0)
    val v1 = CommitLog.commit(spark, table, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(v1 == 1)
    assert(CommitLog.readLatest(spark, table).count() == 2)
    // torn write: data dir without marker must stay invisible
    Seq((99, "junk")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$table/v2")
    assert(CommitLog.latestVersion(spark, table).contains(1))
    assert(CommitLog.readLatest(spark, table)
      .collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("CommitLog: concurrent committers land distinct versions, no torn reads") {
    import spark.implicits._
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog_cas"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    val perThread = 3
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // two writers, no shared lock: every (writer, i) dataset has a
    // distinct row count so a version's content identifies its committer
    def writer(name: String, base: Int): Thread = new Thread(() =>
      try {
        for (i <- 0 until perThread) {
          barrier.await() // line both writers up on each round's race
          val df = (1 to base + i).map(k => (k, name)).toDF("id", "who")
          results.add(name -> CommitLog.commit(spark, table, df))
        }
      } catch { case t: Throwable => errs.add(t); barrier.reset() })
    val a = writer("a", 10)
    val b = writer("b", 20)
    a.start(); b.start(); a.join(60000); b.join(60000)
    assert(errs.isEmpty, s"commit threw: ${errs.peek()}")
    val vs = results.toArray(Array.empty[(String, Int)]).toSeq
    assert(vs.size == 2 * perThread)
    // every commit got its own version — the CAS never double-assigned
    assert(vs.map(_._2).distinct.size == 2 * perThread, s"versions: $vs")
    assert(CommitLog.latestVersion(spark, table).contains(vs.map(_._2).max))
    // each committed version is complete and matches exactly what its
    // winner wrote (readers can never observe a half-renamed dataset)
    for ((who, v) <- vs) {
      val df = spark.read.parquet(s"$table/v$v")
      val whos = df.select("who").distinct().collect().map(_.getString(0)).toSeq
      assert(whos == Seq(who), s"v$v mixed content: $whos")
      val n = df.count()
      val expected = if (who == "a") (10 until 10 + perThread) else (20 until 20 + perThread)
      assert(expected.map(_.toLong).contains(n), s"v$v count $n")
    }
  }

  test("CommitLog: a dead claimer's orphan slot is skipped, readers unaffected") {
    import spark.implicits._
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog_gap"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    assert(CommitLog.commit(spark, table, Seq((1, "a")).toDF("id", "v")) == 0)
    // a writer that died after claiming v1: claim exists, no marker, and
    // possibly torn data — all invisible
    new java.io.File(s"$table/_claims").mkdirs()
    new java.io.File(s"$table/_claims/1").createNewFile()
    Seq((9, "torn")).toDF("id", "v").write.mode("overwrite").parquet(s"$table/v1")
    val v = CommitLog.commit(spark, table, Seq((2, "b"), (3, "c")).toDF("id", "v"))
    assert(v == 2, s"expected the orphan slot 1 skipped, got $v")
    assert(CommitLog.latestVersion(spark, table).contains(2))
    assert(CommitLog.readLatest(spark, table).count() == 2)
  }

  test("CommitLog: stale-read writer + GC-freed claim slot cannot mutate a published version") {
    import spark.implicits._
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog_resurrect"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    assert(CommitLog.commit(spark, table, Seq((1, "v0")).toDF("id", "who")) == 0)
    assert(CommitLog.commit(spark, table, Seq((1, "v1"), (2, "v1")).toDF("id", "who")) == 1)
    // the dangerous state: v1 is published AND its claim file was reaped
    // (as an over-eager GC would), so the CAS slot for 1 is free again
    new java.io.File(s"$table/_claims/1").delete()
    // a writer whose latestVersion read raced v1's publish believes the
    // next free slot is 1 — it wins the resurrected claim file, and before
    // the fix would delete the published v1 dir and rename over it
    val v = CommitLog.commitFrom(spark, table,
      Seq((9, "late")).toDF("id", "who"), startVersion = Some(1))
    assert(v == 2, s"stale writer must bump past the published slot, landed at $v")
    // published v1 is byte-for-byte untouched
    val v1 = spark.read.parquet(s"$table/v1").collect().map(_.getString(1)).toSet
    assert(v1 == Set("v1"), s"published v1 mutated: $v1")
    assert(CommitLog.readLatest(spark, table).collect().map(_.getString(1)).toSet == Set("late"))
  }

  test("CommitLog.gc: claims reaped only when marker-backed AND past TTL; markerless kept") {
    import spark.implicits._
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog_gcgate"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    assert(CommitLog.commit(spark, table, Seq((1, "a")).toDF("id", "v")) == 0)
    assert(CommitLog.commit(spark, table, Seq((2, "b")).toDF("id", "v")) == 1)
    // markerless claim at 2 — a live (or dead) pre-publish writer
    new java.io.File(s"$table/_claims/2").createNewFile()
    val old = System.currentTimeMillis() - 3 * 60 * 60 * 1000
    Seq(0, 1, 2).foreach(v => new java.io.File(s"$table/_claims/$v").setLastModified(old))
    val p = new org.apache.hadoop.fs.Path(table)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.gc(fsys, p, latestCommitted = 1, ttlMs = 60 * 60 * 1000)
    assert(!new java.io.File(s"$table/_claims/0").exists(), "old marker-backed claim 0 reaped")
    assert(!new java.io.File(s"$table/_claims/1").exists(), "old marker-backed claim 1 reaped")
    assert(new java.io.File(s"$table/_claims/2").exists(),
      "markerless claim must survive GC — it is the tombstone keeping its slot unreachable")
    // fresh marker-backed claim: inside TTL, must survive
    assert(CommitLog.commit(spark, table, Seq((3, "c")).toDF("id", "v")) == 3)
    CommitLog.gc(fsys, p, latestCommitted = 3, ttlMs = 60 * 60 * 1000)
    assert(new java.io.File(s"$table/_claims/3").exists(),
      "claim younger than TTL must survive even with its marker present")
  }

  test("CommitLog.gc: staging liveness is the tree max mtime, not the top-level dir") {
    import Layout.CommitLog
    val table = "/tmp/graft_test_commitlog_tmpttl"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(table))
    new java.io.File(table).mkdirs()
    val old = System.currentTimeMillis() - 3 * 60 * 60 * 1000
    // live long-running write: top-level dir mtime is stale (set at job
    // start) but a task just committed a file deep under _temporary/
    val live = new java.io.File(s"$table/_tmp-live/_temporary/0/task_0")
    live.mkdirs()
    val fresh = new java.io.File(live, "part-0000")
    fresh.createNewFile()
    new java.io.File(s"$table/_tmp-live").setLastModified(old)
    new java.io.File(s"$table/_tmp-live/_temporary").setLastModified(old)
    // dead write: every mtime in the tree is past the TTL
    val dead = new java.io.File(s"$table/_tmp-dead/_temporary/0/task_0")
    dead.mkdirs()
    val deadFile = new java.io.File(dead, "part-0000")
    deadFile.createNewFile()
    Seq(s"$table/_tmp-dead", s"$table/_tmp-dead/_temporary",
      s"$table/_tmp-dead/_temporary/0", dead.getPath, deadFile.getPath)
      .foreach(new java.io.File(_).setLastModified(old))
    val p = new org.apache.hadoop.fs.Path(table)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.gc(fsys, p, latestCommitted = -1, ttlMs = 60 * 60 * 1000)
    assert(new java.io.File(s"$table/_tmp-live").exists(),
      "staging dir with fresh task files must survive the sweep")
    assert(!new java.io.File(s"$table/_tmp-dead").exists(),
      "staging dir idle across its whole tree must be reaped")
  }

  test("compact collapses a fragmented directory and preserves rows") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i, s"v$i")).toDF("id", "v")
    val frag = "/tmp/graft_test_frag"
    val out = "/tmp/graft_test_compact"
    df.repartition(32).write.mode("overwrite").parquet(frag)
    val bytes = Layout.dataBytes(spark, frag)
    val (before, after) = Layout.compact(spark, frag, out, math.max(1L, bytes / 2))
    assert(before == 32)
    assert(after <= 3 && after >= 1, s"after=$after")
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.agg(sum("id")).head().getLong(0) == 5000L * 5001 / 2)
  }
}
