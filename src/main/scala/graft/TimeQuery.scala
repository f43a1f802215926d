package graft

import org.apache.spark.sql.SparkSession

/** First-use lazy-init bisector (round-13 verdict item 5): run named
  * registered queries N times each in ONE fresh JVM, after exactly the
  * bench's untimed warmup, and print per-iteration seconds. A query whose
  * iteration 1 sits well above iterations 2..N in a quiet JVM is paying
  * first-use initialization (codegen class loading, lazy object init,
  * first-touch of an expression family) that `Bench` bills to whichever
  * registered query alphabetically reaches that family first — the q03
  * pattern (r13: ~1.4 s of first-string-function collation init). The
  * delta here bounds what a family-specific warmup probe would recover.
  *
  *   java ... graft.TimeQuery <sfDir> <iters> q09_dedup_key q33_minhash_pairs
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <iters> <query>...")
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE decouples shuffle.partitions from the core count
    // for the partition-count sensitivity sweep (a 1000-executor cluster
    // runs with thousands of shuffle partitions — the engine's plans must
    // not depend on partitions == cores). Default preserves the bench's
    // partitions-track-cores sizing.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
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
    // the bench's exact untimed warmup: q01 noop write + the one-row
    // string-function probe — so iteration 1 here sees the same JVM state
    // the in-bench first execution of the target family sees
    try SparkEntry.queries("q01_scan_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try spark.range(1)
      .select(org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.col("id").cast("string"),
          org.apache.spark.sql.functions.lit(" x ")))).as("v"))
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // GRAFT_TQ_PROBE: comma-separated extra one-row warmup probes, for
    // bisecting WHICH execution family's first-use init a query is paying
    // (candidate probes for Bench's untimed warmup — measured, then
    // promoted there if they recover ≥0.5 s)
    val probes = sys.env.getOrElse("GRAFT_TQ_PROBE", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    import org.apache.spark.sql.functions._
    if (probes("window")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("id"))
      try spark.range(2).select(row_number().over(w).as("rn"))
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (probes("join")) {
      try spark.range(2).as("a").join(spark.range(2).as("b"), "id")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (probes("shufflejoin")) {
      try spark.range(2).as("a").hint("merge")
        .join(spark.range(2).as("b"), "id")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (probes("explode")) {
      try spark.range(1).select(explode(array(lit(1), lit(2))).as("v"))
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (probes("agg")) {
      try spark.range(4).groupBy(pmod(col("id"), lit(2)).as("k"))
        .agg(sum("id").as("s"))
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (probes("minhash")) {
      // two-row end-to-end minhash near-dup shape: absorbs first-use init
      // of the custom signature expression + banding + verify machinery
      // with data volume ~0
      try {
        val tiny = spark.createDataFrame(Seq(
          (1L, "aa bb cc dd ee ff gg hh"), (2L, "aa bb cc dd ee ff gg ii")))
          .toDF("doc_id", "text")
        graft.operators.Dedup.minhashNearDups(tiny, "doc_id", "text").count()
      } catch { case _: Throwable => () }
    }
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }
      s""""$name":[${ts.map(t => f"$t%.3f").mkString(",")}]"""
    }
    println(s"""{"iters":$iters,${out.mkString(",")}}""")
    spark.stop()
  }
}
