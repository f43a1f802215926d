package graft

import org.apache.spark.sql.SparkSession

/** Sweep every registered batch query for the narrow-layout hazard:
  * costly per-row work (regex / split / higher-order lambda / hash /
  * UDF — [[graft.operators.Shuffle.hasCostlyRowWork]]'s families) in a
  * scan-side plan segment, i.e. below the first Exchange, where it runs
  * at SOURCE-GRANTED width instead of shuffle width. On the sf10
  * single-file layout that width is 3-4 tasks on a 32-core box; this
  * exact shape cost q43 (round 14), q37/q168/q137 (round 16), then q07
  * and q148 (round 16 post-session) 2-5× each before being found one
  * bench-tail hunt at a time. The audit makes the hunt a one-command
  * sweep.
  *
  * A flagged query is a CANDIDATE, not a verdict: aggregate-only
  * segments are often decode-floor (widenPlan declines there by
  * measurement — see its scaladoc), and tiny sources don't care. The
  * output marks which flagged queries already route through
  * widenPlan/SortedDerive upstream (their heavy work sits ABOVE an
  * exchange, so they won't flag at all) — anything flagged is work the
  * rule does NOT currently see at shuffle width, and deserves the same
  * A/B q07/q148 got.
  *
  * Usage: WidthAudit [sfDir]  (default sf0.001 — plan shapes, not
  * timings, so the smallest SF suffices; queries that execute driver
  * jobs at build time run them at that SF).
  */
object WidthAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE OFF: the audit reads executedPlan for its exchange topology
      // (queryExecution.sparkPlan predates EnsureRequirements, so the
      // exchanges that define "scan-side" are not inserted yet there);
      // with AQE on, executedPlan is an AdaptiveSparkPlanExec whose
      // children do not traverse.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_audit")
      // audit at BIG-SF plan topology on small-SF data: a 1-partition
      // source satisfies every required distribution, so EnsureRequirements
      // inserts NO exchanges and the whole plan reads as scan-side (every
      // SortedDerive query false-flags). Forcing multi-partition scans
      // restores the exchange-ful shape the sf1/sf10 layouts produce.
      // 3 scan partitions < the 8-slot floor models the sf10 single-file
      // reality (a ~400 MB file under the 128 MB default): a widenPlan/
      // ensureMinScanWidth guard FIRES under it and reports wide, so a
      // NARROW line is a segment no guard protects.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_AUDIT_PART_BYTES", s"${768 * 1024}"))
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (!df.isStreaming) {
          // executedPlan (AQE off above) carries EnsureRequirements'
          // exchanges; building it executes no stages
          val segs = graft.operators.Shuffle.scanSideSegments(df.queryExecution.executedPlan)
          val hot = segs.filter(graft.operators.Shuffle.hasCostlyRowWork)
          if (hot.nonEmpty) {
            val floor = spark.sparkContext.defaultParallelism
            // a segment runs at its leaves' granted width (narrow ops
            // preserve partitioning). For parquet leaves the honest width
            // is row-group-capped (Shuffle.effectiveScanWidth's rationale:
            // planned splits lie on compacted files); leaf.execute()
            // builds the RDD lineage without running a job.
            // same row-group-capped dispatch as the guard it audits
            // (Shuffle.rowGroupCappedWidth — one copy, cannot drift)
            val widths = hot.flatMap(_.collectLeaves()).map {
              case s: org.apache.spark.sql.execution.FileSourceScanExec =>
                scala.util.Try(graft.operators.Shuffle.rowGroupCappedWidth(
                  s, s.execute().getNumPartitions, floor)).getOrElse(-1)
              case l => scala.util.Try(l.execute().getNumPartitions).getOrElse(-1)
            }
            val narrow = widths.exists(w => w >= 0 && w < floor)
            val leaves = hot.flatMap(_.collectLeaves()).map(_.nodeName).distinct
            val tag = if (narrow) "NARROW" else "wide-here"
            if (narrow) flagged += name
            println(s"FLAG[$tag] $name — costly row work at scan width " +
              s"${widths.mkString("/")} (floor $floor; " +
              s"leaves: ${leaves.mkString(", ")})")
            if (sys.env.contains("GRAFT_AUDIT_DEBUG"))
              hot.foreach(seg => println(seg.treeString.linesIterator
                .take(25).mkString("  | ", "\n  | ", "")))
          }
        }
      } catch { case e: Throwable =>
        println(s"SKIP $name (${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(80)})")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    println(s"\n=== ${flagged.size} NARROW (unguarded costly scan-side work " +
      s"below the parallelism floor): ${flagged.mkString(", ")}")
    spark.stop()
  }
}
