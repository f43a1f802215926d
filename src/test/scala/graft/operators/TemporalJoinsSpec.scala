package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 11:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")),  // before any right → null
      (4L, "u2", ts("2024-01-01 10:30:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 10:30:00"), 200.0),
      ("u2", ts("2024-01-01 10:30:00"), 300.0))  // exact tie → matches (>=)
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect()
    val got = out.map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 100.0), (2L, 200.0), (3L, null), (4L, 300.0)))
  }

  test("asofJoinMerge (custom physical operator) matches the known answers") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 11:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")),
      (4L, "u2", ts("2024-01-01 10:30:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 10:30:00"), 200.0),
      ("u2", ts("2024-01-01 10:30:00"), 300.0))
      .toDF("k", "rt", "v")
    val df = TemporalJoins.asofJoinMerge(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "expected the custom exec in the physical plan")
    val got = df.orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 100.0), (2L, 200.0), (3L, null), (4L, 300.0)))
  }

  test("asofJoinMerge equals the union+window form on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // keys with 0, 1, and many right rows; duplicate (key, ts) right rows;
    // left timestamps before/among/after the right range
    val left = (0 until 500).map { i =>
      (i.toLong, s"k${rnd.nextInt(20)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("id", "k", "t")
    val right = (0 until 300).map { _ =>
      (s"k${rnd.nextInt(15)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextInt(1000).toDouble)
    }.toDF("k", "rt", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "k", "t", "asof_rt", "asof_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val merge = canon(TemporalJoins.asofJoinMerge(left, right, Seq("k"), "t", "rt", Seq("v")))
    val window = canon(TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v")))
    assert(merge.toSeq == window.toSeq)
  }

  test("PushFilterThroughAsOfJoin pushes key predicates into both sides") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val left = (0 until 200).map(i => (i.toLong, (i % 10).toLong,
      ts(f"2024-01-01 10:${i % 60}%02d:00"))).toDF("id", "k", "t")
    val right = (0 until 100).map(i => ((i % 12).toLong,
      ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toDouble)).toDF("k", "rt", "v")
    val joined = TemporalJoins.asofJoinMerge(left, right, Seq("k"), "t", "rt", Seq("v"))
    val filtered = joined.filter(col("k") < 3)
    // the optimized plan must carry the key filter BELOW the join on both
    // children (the default optimizer can't see through the custom node)
    val opt = filtered.queryExecution.optimizedPlan
    var filtersUnderJoin = 0
    opt.foreach {
      case j: graft.plans.AsOfJoinNode =>
        j.children.foreach(_.foreach {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter
              if f.condition.toString.contains("< 3") => filtersUnderJoin += 1
          case _ =>
        })
      case _ =>
    }
    assert(filtersUnderJoin == 2, s"expected the key filter under both sides:\n$opt")
    // and the pushed plan must compute the same rows as filter-after-join
    // computed without the rule (the window form as independent oracle)
    val expected = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .filter(col("k") < 3).collect().map(_.toSeq).sortBy(_.toString)
    val got = filtered.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == expected.toSeq)
  }

  test("asofJoinForward picks the earliest right row at-or-after each left row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 11:00:00")),  // after all right → null
      (3L, "u1", ts("2024-01-01 09:00:00")),
      (4L, "u2", ts("2024-01-01 10:30:00")))  // exact tie → matches (>=)
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 10:30:00"), 200.0),
      ("u2", ts("2024-01-01 10:30:00"), 300.0))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoinForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect()
    val got = out.map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 200.0), (2L, null), (3L, 100.0), (4L, 300.0)))
  }

  test("asofJoinTolerance nulls matches staler than the tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),   // match at 09:30 → fresh (30 min)
      (2L, "u1", ts("2024-01-01 12:00:00")))   // match at 10:30 → stale (90 min)
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 10:30:00"), 200.0))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoinTolerance(
        left, right, Seq("k"), "t", "rt", Seq("v"), expr("INTERVAL 1 HOUR"))
      .orderBy("id").collect()
    val got = out.map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 100.0), (2L, null)))
  }

  test("asofJoin matches a brute-force computation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val leftRows = (1L to 300L).map(i =>
      (i, s"k${rnd.nextInt(5)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    val rightRows = (1 to 60).map(i =>
      (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toDouble))
      // unique (key, ts): keep max v like firstRowByKey? use distinct-by via groupBy min
      .groupBy(r => (r._1, r._2)).map(_._2.minBy(_._3)).toSeq
    val out = TemporalJoins.asofJoin(
      leftRows.toDF("id", "k", "t"), rightRows.toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(id) == expect, s"row $id")
    }
  }

  test("asofJoinForward matches a brute-force computation on random data " +
      "(the r20 reversed-window form)") {
    // the forward form now sorts DESCENDING and takes last(ignoreNulls)
    // over the incremental preceding frame instead of first(ignoreNulls)
    // over the per-row-rescanning following frame — this pins the
    // equivalence on data with ties, gaps, and keys with no match at all
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val leftRows = (1L to 300L).map(i =>
      (i, s"k${rnd.nextInt(6)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    val rightRows = (1 to 50).map(i =>
      (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.minBy(_._3)).toSeq
    val out = TemporalJoins.asofJoinForward(
      leftRows.toDF("id", "k", "t"), rightRows.toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && !r._2.before(t))
        .sortBy(_._2.getTime).headOption.map(_._3)
      assert(out(id) == expect, s"row $id")
    }
  }

  test("rangeJoin equals the naive between-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val points = (1L to 200L).map(i =>
      (i, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("pid", "pt")
    val intervals = (1L to 40L).map { i =>
      val h = rnd.nextInt(24); val m = rnd.nextInt(50)
      (i, ts(f"2024-01-01 $h%02d:$m%02d:00"), ts(f"2024-01-01 $h%02d:${m + 9}%02d:59"))
    }.toDF("iid", "s", "e")
    val naive = points.join(intervals, $"pt" >= $"s" && $"pt" <= $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = TemporalJoins.rangeJoin(points, "pt", intervals, "s", "e",
      bucketMicros = 7L * 60 * 1000 * 1000) // bucket smaller than span: multi-chunk explode
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("rangeJoin plan is a hash join on the chunk, not a nested loop") {
    import spark.implicits._
    val points = (1L to 50L).map(i => (i, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val intervals = (1L to 5L).map(i =>
      (i, ts("2024-01-01 09:59:00"), ts("2024-01-01 10:01:00"))).toDF("iid", "s", "e")
    val plan = TemporalJoins.rangeJoin(points, "pt", intervals, "s", "e", 60L * 1000 * 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
