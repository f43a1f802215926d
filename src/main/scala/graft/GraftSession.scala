package graft
import org.apache.spark.sql.SparkSession

/** Session construction shared by the verify/bench harness mains.
  *
  * `SPARK_GRAFT_MASTER=local-cluster[2,8,4096]` runs the harness with
  * separate executor JVMs — the cheapest proxy for a real cluster:
  * closures, shuffle blocks, and broadcasts actually serialize across
  * process boundaries instead of sharing the driver heap (local[N]
  * never exercises any of that). Executors need our classes and the
  * JDK17 module opens on their own classpaths, which we forward from
  * the driver process.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder = {
    // empty counts as unset: `env SPARK_GRAFT_MASTER= cmd` is the natural
    // shell idiom for "pin to the in-process master" (the chaos script's
    // clean-reference runs use it), and master("") throws in Spark
    val master = sys.env.get("SPARK_GRAFT_MASTER").filter(_.nonEmpty)
      .getOrElse(s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE may re-coalesce cached plans (matches EngineSession; see its
      // scaladoc for the measured high-partition persist() cost)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    if (master.startsWith("local-cluster")) {
      val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
        "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
        .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", opens)
    }
    b
  }
}
