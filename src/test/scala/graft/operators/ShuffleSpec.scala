package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShuffleSpec extends SparkSpec {

  test("saltedCountSum equals the direct groupBy on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val df = ((1 to 10000).map(_ => ("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", 2.0)))
      .toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Shuffle.saltedCountSum(df, Seq("k"), "v", salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("saltForJoin preserves join results") {
    import spark.implicits._
    val big = ((1 to 5000).map(_ => (1, "x")) ++ (1 to 50).map(i => (i + 1, "y")))
      .toDF("id", "payload").repartition(8)
    val dim = (1 to 60).map(i => (i, s"name$i")).toDF("id", "name")
    val plain = big.join(dim, "id").count()
    val (bigS, dimS) = Shuffle.saltForJoin(big, dim, salts = 8)
    val saltedCount = bigS.join(dimS, Seq("id", "__salt")).count()
    assert(saltedCount == plain)
  }

  private def repartitionNodes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      // coalesce() is a non-shuffle Repartition node — count only real ones
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition if r.shuffle => r
    }.size

  test("widenPlan widens a narrow source under costly row work") {
    import spark.implicits._
    val narrow = (1 to 100).map(i => (i.toLong, s"some <b>text</b> $i"))
      .toDF("id", "text").coalesce(1)
    val out = Shuffle.widenPlan(narrow, 4)(
      _.select(col("id"), regexp_replace(col("text"), "<.*?>", " ").as("t")))
    assert(repartitionNodes(out) == 1,
      "regex projection on a 1-partition source must be widened")
    assert(out.count() == 100)
  }

  test("widenPlan declines on a decode-floor aggregate (q29 shape)") {
    import spark.implicits._
    val narrow = (1 to 100).map(i => (s"k${i % 3}", i.toDouble))
      .toDF("k", "v").coalesce(1)
    val out = Shuffle.widenPlan(narrow, 4)(
      _.groupBy("k").agg(sum(col("v").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("c")))
    assert(repartitionNodes(out) == 0,
      "cast+sum partials are accumulator-cheap; widening is pure cost")
    assert(out.count() == 3)
  }

  test("widenPlan passes an exchange-containing source through unprobed") {
    import spark.implicits._
    // 3 < floor 4, and the derive is costly — but the source already
    // shuffles, so the probe (which would execute the exchange under
    // AQE) must not run and no second repartition may be added
    val source = (1 to 100).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(3)
    val out = Shuffle.widenPlan(source, 4)(
      _.select(col("id"), regexp_replace(col("text"), "t", "x").as("t")))
    assert(repartitionNodes(out) == 1, "only the source's own repartition")
  }

  test("effectiveScanWidth: row groups cap a planned-wide single-file parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rg").toString
    // one file, ONE row group (default 128MB block), padded rows so the
    // byte-range planner cuts many splits once maxPartitionBytes shrinks
    (1 to 20000).map(i => (i.toLong, "x" * 200)).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one_rg")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = spark.read.parquet(s"$dir/one_rg")
      val planned = df.rdd.getNumPartitions
      assert(planned >= 4, s"test premise: planner cuts many splits, got $planned")
      // the planned width lies; the single row group is the truth
      assert(Shuffle.effectiveScanWidth(df, 4) == 1)
      // and the guard now fires where the planned-width probe declined
      assert(repartitionNodes(Shuffle.ensureMinScanWidth(df, 4)) == 1,
        "a 1-row-group file must widen regardless of planned splits")
      // many row groups -> genuinely wide -> no repartition
      (1 to 20000).map(i => (i.toLong, "x" * 200)).toDF("id", "text")
        .coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", "65536")
        .parquet(s"$dir/many_rg")
      val wide = spark.read.parquet(s"$dir/many_rg")
      assert(Shuffle.effectiveScanWidth(wide, 4) >= 4)
      assert(repartitionNodes(Shuffle.ensureMinScanWidth(wide, 4)) == 0)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("effectiveScanWidth consults the PRUNED file listing, not the whole table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    // 6 hive partitions x 1 compacted file each = 6 files in the relation
    // (>= floor 4, so the unpruned file-count shortcut would declare any
    // scan wide) — but a partition-pruned scan reads ONE single-row-group
    // file and must be seen as width 1 (ADVICE r16)
    (0 until 6).foreach { p =>
      (1 to 20000).map(i => (i.toLong, "x" * 200)).toDF("id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/t/p=$p")
    }
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val pruned = spark.read.parquet(s"$dir/t").filter(col("p") === 3)
      assert(pruned.rdd.getNumPartitions >= 4,
        "test premise: the planner cuts many splits on the pruned file")
      assert(Shuffle.effectiveScanWidth(pruned, 4) == 1,
        "pruned to one 1-row-group file: the 6-file relation total must not shortcut")
      // unpruned, the same table really does have >= floor row groups
      assert(Shuffle.effectiveScanWidth(spark.read.parquet(s"$dir/t"), 4) >= 4)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "f")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "d")
    for (t <- Seq("graft_test_facts", "graft_test_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft_test_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Shuffle.writeBucketed(facts, "graft_test_facts", "k", 4)
    Shuffle.writeBucketed(dims, "graft_test_dims", "k", 4)
    val joined = spark.table("graft_test_facts")
      .join(spark.table("graft_test_dims"), "k")
    // disable broadcast so the co-located path is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(!Shuffle.hasShuffle(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
