package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import scala.util.Random

class OrderedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, ps: Seq[(String, Double)]) =
    df.groupBy("g").agg(
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.head,
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.tail: _*)

  private def assertMatches(rows: Seq[(String, java.lang.Double)], ps: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("g", "v")
    // threshold 0 forces the selection path — the machinery under test
    // (default dispatch sends test-sized data to the sort form)
    val ours = OrderedStats.exactPercentiles(df, "g", "v", ps, selectionThreshold = 0)
      .orderBy("g").collect()
    val ref = builtin(df, ps)
      .filter(col(ps.head._1).isNotNull) // all-null groups are omitted by ours
      .orderBy("g").collect()
    assert(ours.length == ref.length, s"group count: ${ours.length} vs ${ref.length}")
    ours.zip(ref).foreach { case (a: Row, b: Row) =>
      assert(a.getString(0) == b.getString(0))
      ps.indices.foreach { i =>
        val (x, y) = (a.getDouble(i + 1), b.getDouble(i + 1))
        assert(math.abs(x - y) < 1e-9, s"group ${a.getString(0)} col ${ps(i)._1}: $x vs $y")
      }
    }
  }

  test("matches the built-in percentile on random groups (ties included)") {
    val rnd = new Random(47)
    // values drawn from a small integer set so ties are guaranteed
    val rows = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(5)}", java.lang.Double.valueOf(rnd.nextInt(40).toDouble))
    }
    assertMatches(rows, Seq("p50" -> 0.5, "p95" -> 0.95, "p01" -> 0.01))
  }

  test("singleton and pair groups interpolate exactly") {
    assertMatches(
      Seq(("a", java.lang.Double.valueOf(7.0)),
        ("b", java.lang.Double.valueOf(1.0)), ("b", java.lang.Double.valueOf(2.0))),
      Seq("p50" -> 0.5, "p95" -> 0.95))
  }

  test("nulls are ignored; all-null groups are omitted") {
    val rows = Seq(
      ("a", java.lang.Double.valueOf(1.0)), ("a", null.asInstanceOf[java.lang.Double]),
      ("a", java.lang.Double.valueOf(3.0)),
      ("z", null.asInstanceOf[java.lang.Double]))
    val out = OrderedStats.exactPercentiles(
      rows.toDF("g", "v"), "g", "v", Seq("p50" -> 0.5), selectionThreshold = 0).collect()
    assert(out.length == 1 && out.head.getString(0) == "a")
    assert(out.head.getDouble(1) == 2.0) // median of (1, 3) ignoring the null
  }

  test("boundary percentiles p=0 and p=1 return min and max") {
    val rows = Seq("a" -> 5.0, "a" -> 9.0, "a" -> 1.0)
      .map { case (g, v) => (g, java.lang.Double.valueOf(v)) }
    val out = OrderedStats.exactPercentiles(
      rows.toDF("g", "v"), "g", "v", Seq("lo" -> 0.0, "hi" -> 1.0),
      selectionThreshold = 0).collect()
    assert(out.head.getDouble(1) == 1.0 && out.head.getDouble(2) == 9.0)
  }

  test("no percentile buffer in the plan (selection aggregates only)") {
    val df = (1 to 100).map(i => (s"g${i % 3}", java.lang.Double.valueOf(i.toDouble)))
      .toDF("g", "v")
    val plan = OrderedStats.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5),
        selectionThreshold = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"), plan)
  }

  test("selection and sort forms agree bit-exactly") {
    val rnd = new Random(11)
    val rows = (1 to 3000).map { _ =>
      (s"g${rnd.nextInt(7)}", java.lang.Double.valueOf(rnd.nextGaussian() * 1e6))
    }
    val df = rows.toDF("g", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
    val sel = OrderedStats.exactPercentiles(df, "g", "v", ps, selectionThreshold = 0)
      .orderBy("g").collect()
    val srt = OrderedStats.exactPercentilesBySort(df, "g", "v", ps)
      .orderBy("g").collect()
    assert(sel.length == srt.length)
    sel.zip(srt).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      ps.indices.foreach { i =>
        assert(a.getDouble(i + 1) == b.getDouble(i + 1),
          s"${a.getString(0)} ${ps(i)._1}: ${a.getDouble(i + 1)} vs ${b.getDouble(i + 1)}")
      }
    }
  }

  test("duplicate-heavy groups resolve via the equal-value bucket exit") {
    // one group where 90% of values are the same constant: the median's
    // bucket has min == max, so selection must resolve it WITHOUT a leaf
    // window (and regardless, match the built-in)
    val rows = (1 to 1000).map { i =>
      ("a", java.lang.Double.valueOf(if (i <= 900) 42.0 else i.toDouble))
    }
    assertMatches(rows, Seq("p50" -> 0.5, "p10" -> 0.1, "p99" -> 0.99))
  }

  test("default dispatch sends small groups to the sort form (and agrees)") {
    val rows = (1 to 500).map(i => (s"g${i % 3}", java.lang.Double.valueOf(i.toDouble)))
    val df = rows.toDF("g", "v")
    val auto = OrderedStats.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5))
    // sort form's signature: a row_number window over the data
    assert(auto.queryExecution.executedPlan.toString.contains("row_number"))
    val sorted = OrderedStats.exactPercentilesBySort(df, "g", "v", Seq("p50" -> 0.5))
    assert(auto.orderBy("g").collect().toSeq === sorted.orderBy("g").collect().toSeq)
  }

  test("dispatch probes raw row count (upper bound), not non-null count") {
    // 600 rows, 550 null values: non-null volume (50) is under the
    // threshold (500) but the probe reads the group column alone, so it
    // sees 600 and must pick SELECTION — the conservative direction (both
    // forms are exact; the bound only ever costs performance on
    // null-heavy corpora, never correctness). The result must still
    // match the sort form.
    val rows = (1 to 600).map { i =>
      ("a", if (i <= 550) null.asInstanceOf[java.lang.Double]
            else java.lang.Double.valueOf(i.toDouble))
    }
    val df = rows.toDF("g", "v")
    val ps = Seq("p50" -> 0.5)
    val auto = OrderedStats.exactPercentiles(df, "g", "v", ps,
      selectionThreshold = 500)
    // selection's signature: no row_number window anywhere in the plan
    assert(!auto.queryExecution.executedPlan.toString.contains("row_number"),
      "row-count 600 > threshold 500 must dispatch to selection even " +
        "though only 50 values are non-null")
    val sorted = OrderedStats.exactPercentilesBySort(df, "g", "v", ps)
    assert(auto.orderBy("g").collect().toSeq ===
      sorted.orderBy("g").collect().toSeq)
  }

  test("the sort-path dispatch leaves nothing persisted") {
    // the old probe materialized (persist + count) the full per-group
    // aggregate and then abandoned it when dispatching to the sort form —
    // a leaked cache entry per call in long-lived sessions. The narrow
    // probe must leave the RDD cache exactly as it found it.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val rows = (1 to 400).map(i => (s"g${i % 3}", java.lang.Double.valueOf(i.toDouble)))
    val out = OrderedStats.exactPercentiles(rows.toDF("g", "v"), "g", "v",
      Seq("p50" -> 0.5)) // default threshold: dispatches to sort
    out.collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "sort-path dispatch must not leave persisted RDDs behind")
  }

  test("±Infinity values: selection matches the sort form bit-for-bit") {
    // with an infinite __lo/__hi the old equi-width ratio evaluated to
    // NaN (Inf/Inf), and floor(NaN).cast(Long) throws under ANSI mode —
    // non-finite values must route to exclusive buckets and the range
    // must be computed over finite values only (r14 advice). Parity with
    // the sort form is the contract, including the NaN results the shared
    // interpolation arithmetic produces at infinite endpoints.
    import spark.implicits._
    val rows = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", Double.PositiveInfinity),
      ("b", Double.NegativeInfinity), ("b", 5.0), ("b", 6.0),
      ("c", Double.NaN), ("c", 1.0), ("c", 2.0),
      ("d", Double.NegativeInfinity), ("d", Double.PositiveInfinity),
      ("d", Double.NaN), ("d", 4.0)
    ).map { case (g, v) => (g, java.lang.Double.valueOf(v)) }
    val df = rows.toDF("g", "v")
    val ps = Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0)
    val sel = OrderedStats.exactPercentiles(df, "g", "v", ps, selectionThreshold = 0)
      .orderBy("g").collect()
    val srt = OrderedStats.exactPercentilesBySort(df, "g", "v", ps)
      .orderBy("g").collect()
    assert(sel.length == srt.length)
    sel.zip(srt).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      ps.indices.foreach { i =>
        assert(java.lang.Double.compare(x.getDouble(i + 1), y.getDouble(i + 1)) == 0,
          s"group ${x.getString(0)} ${ps(i)._1}: ${x.getDouble(i + 1)} vs ${y.getDouble(i + 1)}")
      }
    }
  }

  test("an oversized all-infinity bucket terminates (exclusive non-finite buckets)") {
    // 70k +Inf values exceed the leaf bound, forcing recursion on the
    // +Inf bucket. A shared top bucket ({+Inf, NaN} or {finite, +Inf})
    // can never be split by a range — only exclusive per-kind buckets
    // let the equal-value exit terminate the refinement.
    import spark.implicits._
    val rows = (0 until 70000).map(_ =>
      ("a", java.lang.Double.valueOf(Double.PositiveInfinity))) ++
      Seq(("a", java.lang.Double.valueOf(0.0)),
        ("a", java.lang.Double.valueOf(Double.NaN)))
    val df = rows.toDF("g", "v")
    val ps = Seq("p50" -> 0.5)
    val sel = OrderedStats.exactPercentiles(df, "g", "v", ps, selectionThreshold = 0)
      .collect()
    val srt = OrderedStats.exactPercentilesBySort(df, "g", "v", ps).collect()
    assert(sel.length == 1 && srt.length == 1)
    assert(java.lang.Double.compare(sel.head.getDouble(1), srt.head.getDouble(1)) == 0)
  }

  test("the selection path releases its refinement pins (one result pin remains)") {
    // per-level pins (base agg, candidate rows, open sets) accumulated
    // across calls in a long-lived session (r14 advice); now the final
    // G-row result is materialized while they're cached and everything
    // else is released in a finally.
    import spark.implicits._
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val rows = (1 to 5000).map(i => (s"g${i % 3}", java.lang.Double.valueOf((i % 97).toDouble)))
    val out = OrderedStats.exactPercentiles(rows.toDF("g", "v"), "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9), selectionThreshold = 0)
    assert(out.collect().length == 3)
    val left = spark.sparkContext.getPersistentRDDs
    assert(left.size == 1,
      s"selection must leave exactly the G-row result pinned, found ${left.size}")
    spark.catalog.clearCache()
  }

  test("value concentration recurses past an oversized level-1 bucket") {
    // 70k values packed into a 0.07-wide cluster at 1e9 next to a -1e9
    // outlier: level 1's equi-width buckets put the whole cluster into ONE
    // bucket (width ~244k), whose population exceeds the 65536-row leaf
    // bound — the selection must recurse with the bucket's own range and
    // still land on the exact order statistic. Spacing 1e-6 > ulp(1e9)
    // ≈ 1.2e-7 keeps the cluster's values distinct doubles.
    val dense = (0 until 70000).map(i => ("a", java.lang.Double.valueOf(1e9 + i * 1e-6)))
    val rows = dense :+ (("a", java.lang.Double.valueOf(-1e9)))
    val out = OrderedStats.exactPercentiles(
      rows.toDF("g", "v"), "g", "v", Seq("p50" -> 0.5), selectionThreshold = 0).collect()
    // n = 70001, h = (n-1)*0.5 = 35000 exactly; rank 0 is the outlier, so
    // rank 35000 is dense index 34999
    assert(out.length == 1)
    assert(out.head.getDouble(1) == 1e9 + 34999 * 1e-6,
      s"got ${out.head.getDouble(1)}")
  }

  test("groupedRowNumbers matches the window form on a total order") {
    val rnd = new Random(92)
    // few groups, many rows, heavy VALUE ties (the id tiebreak makes the
    // order total — exactly q92's shape), forced through many range
    // partitions so offsets matter
    val rows = (1 to 5000).map(i =>
      (s"t${rnd.nextInt(4)}", rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(7)
    val ours = OrderedStats.groupedRowNumbers(
        df, "g", Seq(col("v").desc, col("id")), numPartitions = 11,
        distributedThreshold = 0)
      .select("g", "v", "id", "rn", "n")
      .collect().map(r => (r.getLong(2), (r.getLong(3), r.getLong(4)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val ref = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .collect().map(r => r.getLong(2) -> (r.getInt(3).toLong, r.getLong(4))).toMap
    assert(ours.size == ref.size)
    ref.foreach { case (id, rnN) =>
      assert(ours(id) == rnN, s"id=$id: ours=${ours(id)} ref=$rnN")
    }
    // and no stage's sort spans a whole group: every window partition key
    // includes the range partition id by construction (plan property, not
    // re-asserted here; the identity above is the semantic gate)
  }

  test("groupedRowNumbersReleasable releases its pin without a global clearCache") {
    val df = (1 to 200).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (out, release) = OrderedStats.groupedRowNumbersReleasable(
      df, "g", Seq(col("id")), numPartitions = 5, distributedThreshold = 0)
    assert(out.count() == 200) // consume: populates the pin
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1,
      "the internal range-partitioned frame should be pinned after consumption")
    release()
    // unpersist(blocking=false) is async at the block level but the
    // CacheManager entry drop is synchronous
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "releaser must drop exactly the one pin this call created")
    release() // idempotent
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    // the result stays correct if re-consumed after release (recomputed
    // from lineage; deterministic input => identical boundaries)
    assert(out.where(col("rn") === 1).count() == 3)
  }

  test("groupedRowNumbers dispatches to the window form below the volume threshold") {
    val rnd = new Random(20)
    val rows = (1 to 3000).map(i =>
      (s"t${rnd.nextInt(4)}", rnd.nextInt(40).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(5)
    val before = spark.sparkContext.getPersistentRDDs.size
    // max group ≈ 750 rows, far below any sane threshold: the dispatch
    // must pick the plain window form — observable as ZERO new pins (the
    // distributed form pins its range-partitioned frame) and a no-op
    // releaser, with identical (rn, n) either way
    val (win, releaseWin) = OrderedStats.groupedRowNumbersReleasable(
      df, "g", Seq(col("v").desc, col("id")))
    val winRows = win.select("id", "rn", "n")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "window-form dispatch must not create a pin")
    releaseWin() // no-op, must not throw or drop anything
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    val dist = OrderedStats.groupedRowNumbers(
        df, "g", Seq(col("v").desc, col("id")), distributedThreshold = 0)
      .select("id", "rn", "n")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(winRows == dist, "both dispatch arms must agree on (rn, n)")
    // and a threshold below the max group volume forces the distributed
    // form even on tiny data (the chaos harness's force-distributed knob).
    // Clear the dist call's pin first: its ranged frame has the same
    // logical plan as forced's, and CacheManager would dedup the persist
    // (no new entry) instead of pinning a second copy.
    spark.catalog.clearCache()
    val forcedBefore = spark.sparkContext.getPersistentRDDs.size
    val (forced, releaseForced) = OrderedStats.groupedRowNumbersReleasable(
      df, "g", Seq(col("v").desc, col("id")), distributedThreshold = 1)
    forced.count()
    assert(spark.sparkContext.getPersistentRDDs.size == forcedBefore + 1,
      "sub-volume threshold must select the distributed (pinned) form")
    releaseForced()
    spark.catalog.clearCache()
  }

  test("ntileFromRn matches the ntile window for every n and k") {
    for (k <- Seq(1, 3, 4, 7); n <- Seq(1, 2, 3, 4, 5, 9, 16, 100)) {
      val df = (1L to n.toLong).toDF("rn")
      val ours = df.select(col("rn"),
          OrderedStats.ntileFromRn(col("rn"), lit(n.toLong), k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("rn"))
      val ref = df.select(col("rn"), ntile(k).over(w).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      assert(ours == ref, s"n=$n k=$k: $ours vs $ref")
    }
  }
}
