package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-signal profile of the curation battery (round-17 sf10
  * attribution). NOT registered, NOT committed.
  */
object AttrScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{CleanFunctions => CF, TextFunctions => TF}
    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      println(f"$name%-32s ${math.min(a, b)}%8.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // widen like the battery does, so per-signal numbers are at the same width
    val docs = graft.operators.Shuffle.ensureMinScanWidth(
      graft.core.Tables.table(spark, sfDir, "documents").select("doc_id", "text"))
    val t0 = col("text")
    t("scan only")(docs)
    t("lower")(docs.select(col("doc_id"), lower(t0).as("l")))
    t("lower+cleanLowered")(docs.select(col("doc_id"), CF.cleanLowered(lower(t0)).as("c")))
    t("lower+clean+split(toks)")(docs.select(col("doc_id"),
      TF.tokens(CF.cleanLowered(lower(t0))).as("ct")))
    t("lower+split(lc_toks)")(docs.select(col("doc_id"), TF.tokens(lower(t0)).as("lt")))
    t("punctCount")(docs.select(col("doc_id"), TF.punctCount(t0).as("p")))
    t("lc_toks+stopcount")(docs.select(col("doc_id"),
      TF.stopwordCountFromTokens(TF.tokens(lower(t0))).as("s")))
    t("clean_toks+vocab")(docs.select(col("doc_id"),
      array_distinct(TF.tokens(CF.cleanLowered(lower(t0)))).as("v")))
    t("clean_toks+vocab+5xlang")({
      val v = array_distinct(TF.tokens(CF.cleanLowered(lower(t0))))
      docs.select(col("doc_id") +: TF.langMarkers.map { case (lang, ws) =>
        TF.langScore(v, ws).as(s"s_$lang") }: _*)
    })
    t("clean_toks+fp(md5)")(docs.select(col("doc_id"),
      TF.fingerprintFromTokens(TF.tokens(CF.cleanLowered(lower(t0)))).as("fp")))
    t("full annotate")(graft.pipeline.Curation.annotate(
      graft.core.Tables.table(spark, sfDir, "documents"), "text"))
    spark.stop()
  }
}
