package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

import graft.SparkSpec

/** SortedDerive's contract has two halves — the result is identical to
  * the naive derive-then-sort, and the PLAN keeps the expensive
  * projection ABOVE the sort exchange. The second half is what the sf1
  * measurement paid for (q77 14.2 s → 1.35 s on a single-row-group
  * source; SCALE.md round-14 "serial scans" section): if a future
  * optimizer rule starts collapsing the projection back below the Sort,
  * the derivation silently returns to scan-width parallelism and the
  * win evaporates with no correctness signal. These plan-shape pins
  * fail loudly instead.
  */
class SortedDeriveSpec extends SparkSpec {
  import spark.implicits._

  private def events = spark.read
    .parquet(s"${graft.TestSpark.sf0001}/events.parquet")

  test("result identical to derive-then-sort (rows AND order)") {
    val viaHelper = SortedDerive(events, Seq("event_id"), Seq("props")) {
      sorted =>
        sorted.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
    }
    val naive = events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")
    assert(viaHelper.schema === naive.schema)
    assert(viaHelper.collect().toSeq === naive.collect().toSeq)
  }

  test("plan keeps the derivation above the sort exchange") {
    val df = SortedDerive(events, Seq("event_id"), Seq("props")) { sorted =>
      sorted.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k"))
    }
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val projIdx = lines.indexWhere(l =>
      l.contains("Project") && l.contains("get_json_object"))
    val sortIdx = lines.indexWhere(_.contains("Sort [event_id"))
    assert(projIdx >= 0, s"no derivation Project in plan:\n$plan")
    assert(sortIdx >= 0, s"no Sort in plan:\n$plan")
    // toString indents children below parents: the deriving Project must
    // print BEFORE (above) the Sort it consumes.
    assert(projIdx < sortIdx,
      s"derivation collapsed below the sort:\n$plan")
    // and the scan must stay narrow: only the sort key + raw input read
    assert(lines.exists(l =>
      l.contains("ReadSchema") && l.contains("event_id") &&
        l.contains("props")), s"scan not narrowed:\n$plan")
  }

  test("aliased inner projection parses once (CollapseProject keeps it)") {
    val mt = MapType(StringType, IntegerType)
    val df = SortedDerive(events, Seq("event_id"), Seq("props")) { sorted =>
      sorted
        .select(col("event_id"), from_json(col("props"), mt).as("m"))
        .select(
          col("event_id"),
          size(col("m")).as("nkeys"),
          element_at(col("m"), "k").as("k_val"))
    }
    val plan = df.queryExecution.executedPlan.toString
    val parses = "from_json".r.findAllIn(plan).length
    assert(parses === 1,
      s"expected exactly one from_json in the physical plan, got $parses:\n$plan")
    // the q77 shape without the alias carries one parse per derived column
    val m = from_json(col("props"), mt)
    val collapsed = events
      .select(col("event_id"), size(m).as("nkeys"),
        element_at(m, "k").as("k_val"))
    val collapsedParses = "from_json".r
      .findAllIn(collapsed.queryExecution.executedPlan.toString).length
    assert(collapsedParses === 2, "control: unaliased shape should parse per column")
  }

  test("sort keys may overlap inputs (distinct projection)") {
    val df = SortedDerive(events, Seq("event_id"), Seq("event_id", "props")) {
      sorted => sorted.select(col("event_id"), length(col("props")).as("n"))
    }
    assert(df.columns.toSeq === Seq("event_id", "n"))
    assert(df.count() > 0)
  }
}
