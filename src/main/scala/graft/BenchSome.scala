package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time a subset of registered queries (args) on
  * SPARK_GRAFT_SF_DIR with the same session config as Bench. Not part of
  * the driver contract — local iteration only.
  */
object BenchSome {
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
    try SparkEntry.queries("q01_scan_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    args.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        if (show) df.show(20, truncate = false)
      } catch { case e: Throwable =>
        println(f"$name%-24s FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
