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

  test("wrong arity gives a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.toLowerCase.contains("arguments"))
  }

  test("extensions hook registers the same builders (applies cleanly)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared with register()
    assert(GraftFunctions.all.map(_._1) == Seq("vec_dot", "vec_l2sq", "vec_cosine"))
  }
}
