package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-protocol chaos driver (tools/run_chaos.sh, commit scenario).
  *
  * The harness composes three OS processes around [[Layout.CommitLog]]:
  * a normal committer, a committer SIGKILLed while parked at the
  * hold-after-claim failpoint (claim won, nothing renamed, no marker —
  * a real process death at the protocol's most delicate point), and a
  * second normal committer that must route around the corpse. `verify`
  * then asserts the reader-facing contract AND the GC contract:
  *
  *  - the dead writer's version is a markerless claim (tombstone): no
  *    `_commits/<v>` marker, no `v<N>` data dir — readers never saw it;
  *  - the post-kill committer BUMPED past the tombstone (version gap),
  *    never reusing or clearing the dead slot;
  *  - `readLatest` returns exactly the last successful writer's rows;
  *  - a TTL-expired GC sweep reaps the corpse's `_tmp-*` staging tree
  *    but NOT its markerless claim (the tombstone is what keeps the torn
  *    slot unreachable forever), while published versions stay readable.
  *
  * Modes: `commit <table> <tag>` (commit 500 rows tagged `tag`, print
  * `committed v<N> tag=<tag>`; parks at the failpoint when
  * `GRAFT_CHAOS_HOLD_AFTER_CLAIM` is exported) and
  * `verify <table> <deadV> <lastTag>`.
  */
object ChaosCommit {

  private def session(): SparkSession = {
    val s = graft.GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def payload(spark: SparkSession, tag: String) =
    spark.range(500).select(col("id"), lit(tag).as("writer"))

  def main(args: Array[String]): Unit = args.toList match {
    case "commit" :: table :: tag :: Nil =>
      val spark = session()
      val v = Layout.CommitLog.commit(spark, table, payload(spark, tag))
      println(s"committed v$v tag=$tag")
      spark.stop()

    case "verify" :: table :: deadVStr :: lastTag :: Nil =>
      val spark = session()
      val deadV = deadVStr.toInt
      val tdir = new Path(table)
      val f = tdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def fail(msg: String): Nothing = { System.err.println(s"[chaos-commit] FAIL: $msg"); sys.exit(4) }
      def names(p: Path): Set[String] =
        if (f.exists(p)) f.listStatus(p).map(_.getPath.getName).toSet else Set.empty

      val commits = names(new Path(tdir, "_commits")).map(_.toInt)
      val claims = names(new Path(tdir, "_claims")).map(_.toInt)
      // tombstone: claimed, never published, never renamed
      if (commits.contains(deadV)) fail(s"dead v$deadV has a commit marker")
      if (!claims.contains(deadV)) fail(s"dead v$deadV claim (tombstone) missing")
      if (f.exists(new Path(tdir, s"v$deadV"))) fail(s"dead v$deadV data dir exists — rename happened?")
      // the surviving committer bumped PAST the tombstone
      val latest = Layout.CommitLog.latestVersion(spark, table)
        .getOrElse(fail("no committed version"))
      if (latest <= deadV) fail(s"latest v$latest did not bump past dead v$deadV")
      // reader sees exactly the last successful writer
      val rows = Layout.CommitLog.readLatest(spark, table)
        .groupBy("writer").count().collect()
      if (rows.length != 1 || rows(0).getString(0) != lastTag || rows(0).getLong(1) != 500L)
        fail(s"readLatest mismatch: ${rows.mkString(",")} (want ($lastTag,500))")
      // corpse staging tree is present pre-GC (the writer died before rename)
      val tmpsBefore = names(tdir).filter(_.startsWith("_tmp-"))
      if (tmpsBefore.isEmpty) fail("no _tmp-* staging dir from the killed writer")
      // GC with an expired TTL: corpse tmp reaped, tombstone claim kept
      Thread.sleep(1500)
      Layout.CommitLog.gc(f, tdir, latest, ttlMs = 1000)
      val tmpsAfter = names(tdir).filter(_.startsWith("_tmp-"))
      if (tmpsAfter.nonEmpty) fail(s"stale staging survived GC: $tmpsAfter")
      if (!names(new Path(tdir, "_claims")).map(_.toInt).contains(deadV))
        fail(s"GC reaped the markerless tombstone claim v$deadV")
      // published data still intact after the sweep
      if (Layout.CommitLog.readLatest(spark, table).count() != 500L)
        fail("readLatest broken after GC")
      println(s"[chaos-commit] OK: tombstone v$deadV kept, latest v$latest tag=$lastTag, corpse staging GC'd")
      spark.stop()

    case other =>
      System.err.println(s"ChaosCommit: unknown args $other"); sys.exit(2)
  }
}
