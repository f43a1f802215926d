package graft.storage

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.vector.VectorStore

/** Serving freshness: index refresh as a versioned commit (VectorStore ∘
  * CommitLog). The contract under test is the one a live retrieval service
  * needs — a reader that resolves "latest" while a rebuild is in flight
  * must always load a COMPLETE published version, and a resolved version
  * must stay immutable for the reader's whole query lifetime.
  */
class ServingFreshnessSpec extends SparkSpec {

  /** Version v carries (v+1)·50 rows, every row tagged v — a torn or
    * mixed-version read breaks the count or the single-tag invariant.
    */
  private def versionDf(v: Int) = {
    import spark.implicits._
    (0 until (v + 1) * 50).map(i => (i.toLong, v)).toDF("id", "tag")
  }

  private def complete(table: String, v: Int): Boolean = {
    val df = VectorStore.loadVersion(spark, table, v)
    val agg = df.agg(count(lit(1)), min("tag"), max("tag")).head()
    agg.getLong(0) == (v + 1) * 50L && agg.getInt(1) == v && agg.getInt(2) == v
  }

  test("refresh becomes visible atomically and old versions stay readable") {
    val table = Files.createTempDirectory("graft_vstore").toString
    assert(VectorStore.latestVersion(spark, table).isEmpty)
    assert(VectorStore.commitVersion(spark, table, versionDf(0)) == 0)
    assert(VectorStore.commitVersion(spark, table, versionDf(1)) == 1)
    val (v, df) = VectorStore.loadLatest(spark, table)
    assert(v == 1 && df.count() == 100)
    // published versions are immutable: v0 still loads complete after the refresh
    assert(complete(table, 0))
  }

  test("a reader querying during concurrent rebuilds always sees a complete version") {
    val table = Files.createTempDirectory("graft_vstore_c").toString
    VectorStore.commitVersion(spark, table, versionDf(0))
    @volatile var writerError: Throwable = null
    val writer = new Thread(() => {
      try (1 to 4).foreach(v => VectorStore.commitVersion(spark, table, versionDf(v)))
      catch { case t: Throwable => writerError = t }
    })
    writer.start()
    var lastSeen = -1
    var reads = 0
    val observations = scala.collection.mutable.ListBuffer.empty[Int]
    // keep reading until the final version is visible (bounded so a hung
    // writer fails the test instead of spinning forever)
    while (lastSeen < 4 && reads < 500 && writerError == null) {
      val (v, df) = VectorStore.loadLatest(spark, table)
      val agg = df.agg(count(lit(1)), min("tag"), max("tag")).head()
      assert(agg.getLong(0) == (v + 1) * 50L && agg.getInt(1) == v && agg.getInt(2) == v,
        s"torn read at version $v: $agg")
      assert(v >= lastSeen, s"latest went backwards: $lastSeen -> $v")
      lastSeen = v
      observations += v
      reads += 1
    }
    writer.join()
    assert(writerError == null, s"writer failed: $writerError")
    assert(lastSeen == 4, s"never observed v4 in $reads reads; saw $observations")
    assert(complete(table, 4))
  }

  test("commit GC sweeps consumed claims and stale staging dirs, never data") {
    val table = Files.createTempDirectory("graft_vstore_gc").toString
    (0 to 2).foreach(v => VectorStore.commitVersion(spark, table, versionDf(v)))
    // plant a dead writer's staging dir and age it past the TTL, plus a
    // fresh one that must survive (a live writer could own it)
    val stale = Paths.get(table, "_tmp-dead"); Files.createDirectory(stale)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 2L * 3600 * 1000))
    val fresh = Paths.get(table, "_tmp-live"); Files.createDirectory(fresh)
    VectorStore.commitVersion(spark, table, versionDf(3))
    assert(!Files.exists(stale), "stale _tmp dir survived GC")
    assert(Files.exists(fresh), "fresh _tmp dir was deleted — live writers at risk")
    // consumed claims are TTL-aged before reaping (a freshly consumed slot
    // must stay occupied so a stale-read racer can't resurrect it): all
    // still present now, reaped once aged past the TTL on the next commit
    val claimsDir = new java.io.File(table, "_claims")
    val claimsNow = Option(claimsDir.list()).map(_.toSeq).getOrElse(Seq.empty)
    assert(claimsNow.map(_.toInt).sorted == Seq(0, 1, 2, 3),
      s"fresh consumed claims must survive inside the TTL: $claimsNow")
    val old = System.currentTimeMillis() - 2L * 3600 * 1000
    claimsDir.listFiles().foreach(_.setLastModified(old))
    VectorStore.commitVersion(spark, table, versionDf(4))
    val claimsAfter = Option(claimsDir.list()).map(_.toSeq).getOrElse(Seq.empty)
    assert(claimsAfter.forall(_.toInt == 4), s"aged consumed claims survived: $claimsAfter")
    // GC never touches published data
    (0 to 4).foreach(v => assert(complete(table, v), s"v$v damaged by GC"))
  }
}
