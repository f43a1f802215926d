package graft
import java.nio.file.{Files, Paths}

/** Dev harness: Verify for a SUBSET of queries (args), same dump + oracle
  * contract as Verify, so tools/check.py can gate individual queries while
  * iterating. Not part of the driver contract — local use only.
  * Usage: VerifySome <sfDir> <outDir> <query...>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val unknown = names -- SparkEntry.queries.keySet
    // a typo'd name must fail loudly, not produce a vacuously-green
    // "oracled 0/0 ok" gate
    require(unknown.isEmpty,
      s"VerifySome: unknown queries ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // master-aware (SPARK_GRAFT_MASTER → local-cluster): GraftSession.
    // The chaos harness (tools/run_chaos.sh) relies on this to run a
    // query subset with separate executor JVMs it can kill mid-job.
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach { case (name, fn) =>
      // drop any stale dump first — a failed query must not be graded
      // green off a previous run's parquet in a reused outDir
      val stale = new org.apache.hadoop.fs.Path(s"$outDir/$name")
      stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(stale, true)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-some] $name failed: ${e.getMessage}")
        e.printStackTrace()
        failed ::= name
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[verify-some] FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
