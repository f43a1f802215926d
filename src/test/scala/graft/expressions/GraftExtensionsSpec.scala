package graft.expressions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       vec_l2sq(array(CAST(0.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS l,
        |       vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 9.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("text-hash kernels evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT ngram_shingles(array('a','b','c','d'), 3) AS sh,
        |       minhash_sigs(array('x','y'), 4) AS mh,
        |       simhash_sig(array('one','two','one')) AS sim""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[Long](1).length == 4)
    // same inputs through the Column API must agree bit-for-bit
    import org.apache.spark.sql.functions._
    val viaCols = spark.range(1).select(
      TextHashExpressions.minhashSigs(
        array(lit("x"), lit("y")), 4).as("mh"),
      TextHashExpressions.simhash(
        array(lit("one"), lit("two"), lit("one"))).as("sim")).head()
    assert(r.getSeq[Long](1) == viaCols.getSeq[Long](0))
    assert(r.getLong(2) == viaCols.getLong(1))
  }

  test("vocab_encode_ids: hashed O(1) lookup matches the map-literal semantics") {
    import org.apache.spark.sql.functions._
    val vocab = Map("the" -> 1, "spark" -> 2, "join" -> 3)
    // codegen path (whole-stage over a real scan)
    import spark.implicits._
    val out = Seq(
      (1L, Seq("the", "spark", "oov", "join")),
      (2L, Seq("oov1", "oov2")),
      (3L, Seq("join"))).toDF("id", "toks")
      .select(col("id"),
        TextHashExpressions.vocabEncodeIds(col("toks"), vocab).as("ids"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "1 2 0 3", 2L -> "0 0", 3L -> "3"))
    // interpreted path (literal fold / eval) must agree
    val one = spark.range(1).select(TextHashExpressions.vocabEncodeIds(
      array(lit("spark"), lit("x"), lit("the")), vocab).as("ids")).head().getString(0)
    assert(one == "2 0 1")
    // empty array encodes to the empty string (callers filter size >= 1)
    val empty = spark.range(1).select(TextHashExpressions.vocabEncodeIds(
      array().cast("array<string>"), vocab).as("ids")).head().getString(0)
    assert(empty == "")
  }

  test("wrong arity gives a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.toLowerCase.contains("arguments"))
  }

  test("topk_by_score works as a SQL aggregate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("a", 1.0, 1L), ("a", 9.0, 2L), ("a", 5.0, 3L), ("b", 2.0, 4L))
      .toDF("g", "s", "id").createOrReplaceTempView("graft_topk_t")
    val rows = spark.sql(
      "SELECT g, topk_by_score(s, id, 2) AS top FROM graft_topk_t GROUP BY g ORDER BY g")
      .collect()
    val aTop = rows(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
    assert(aTop == Seq(2L, 3L))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(4L))
  }

  test("extensions hook registers the same builders (applies cleanly)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared with register()
    assert(GraftFunctions.all.map(_._1) ==
      Seq("vec_dot", "vec_l2sq", "vec_cosine", "topk_by_score",
        "ngram_shingles", "minhash_sigs", "simhash_sig"))
  }
}
