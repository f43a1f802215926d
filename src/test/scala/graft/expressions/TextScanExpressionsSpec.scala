package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

import scala.util.Random

/** Bit-equivalence of the byte-scan kernels with the regex forms they
  * replaced — the whole curation battery (and every oracle hash gated on
  * its outputs) rides on this identity.
  */
class TextScanExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial generator: tags, nested/unclosed brackets, the five
    * line terminators, ASCII punctuation, digits, unicode (incl.
    * supplementary), and the \s set.
    */
  private def randomDoc(rnd: Random): String = {
    val pieces = Seq(
      "hello", "WORLD", "42", "<b>", "</b>", "<", ">", "<>", "<x y=\"1\">",
      "<unclosed", "tag>", "a<b<c>d>e", " ", "\t", "\n", "\r", "",
      "\f", "", " ", " ", "é", "ß", "中文", "😀",
      "!@#$%", "a-b_c", "<\n>", "<a b>", "<ok>", "..", "0x7f")
    (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.size)))
      .mkString("")
  }

  test("cleanScrub == regexp_replace(<.*?>|[^a-z0-9\\s] -> empty) on adversarial strings") {
    val rnd = new Random(17)
    val docs = (1 to 2000).map(i => (i, randomDoc(rnd))) ++
      Seq((100001, ""), (100002, "<"), (100003, ">"), (100004, "<<>>"),
        (100005, "<a"), (100006, "a>"), (100007, "<\r>"), (100008, "<>"),
        (100009, "< >"), (100010, "plain text 123"))
    val df = docs.toDF("id", "t")
    val out = df.select(col("id"),
        TextScanExpressions.cleanScrub(lower(col("t"))).as("k"),
        regexp_replace(lower(col("t")), "<.*?>|[^a-z0-9\\s]", "").as("r"))
      .collect()
    out.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"id=${row.getInt(0)}: kernel=${row.getString(1)} regex=${row.getString(2)}")
    }
    // and the jvm regex agrees too (guards against a Spark regex quirk
    // masking a kernel bug in both columns above)
    docs.foreach { case (id, t) =>
      val jvm = t.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("<.*?>|[^a-z0-9\\s]", "")
      val kernel = TextScan.cleanScrub(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          t.toLowerCase(java.util.Locale.ROOT))).toString
      assert(kernel == jvm, s"id=$id: kernel=$kernel jvm=$jvm")
    }
  }

  test("scrubTags == regexp_replace(<[^>]+>|[^a-zA-Z0-9\\s] -> empty) on adversarial strings") {
    val rnd = new Random(19)
    val docs = (1 to 2000).map(i => (i, randomDoc(rnd))) ++
      Seq((100001, ""), (100002, "<>"), (100003, "<a\nb>"), (100004, "<"),
        (100005, "A<B>C"), (100006, "a<b<c>d>e"), (100007, "< >"),
        (100008, "Keep UPPER 123"))
    val df = docs.toDF("id", "t")
    val out = df.select(col("id"),
        TextScanExpressions.scrubTags(col("t")).as("k"),
        regexp_replace(col("t"), "<[^>]+>|[^a-zA-Z0-9\\s]", "").as("r"))
      .collect()
    out.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"id=${row.getInt(0)}: kernel=${row.getString(1)} regex=${row.getString(2)}")
    }
    docs.foreach { case (id, t) =>
      val jvm = t.replaceAll("<[^>]+>|[^a-zA-Z0-9\\s]", "")
      val kernel = TextScan.scrubTags(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
      assert(kernel == jvm, s"id=$id: kernel=$kernel jvm=$jvm")
    }
  }

  test("punctCount == regexp_count([^a-zA-Z0-9 ]) on adversarial strings") {
    val rnd = new Random(18)
    val docs = (1 to 2000).map(i => (i, randomDoc(rnd))) ++
      Seq((100001, ""), (100002, "abc 123"), (100003, "é中😀"),
        (100004, "\t\n\r"), (100005, "!!!"))
    val df = docs.toDF("id", "t")
    val out = df.select(col("id"),
        graft.functions.TextFunctions.punctCount(col("t")).as("k"),
        regexp_count(col("t"), lit("[^a-zA-Z0-9 ]")).as("r"))
      .collect()
    out.foreach { row =>
      assert(row.getInt(1) == row.getInt(2),
        s"id=${row.getInt(0)}: kernel=${row.getInt(1)} regex=${row.getInt(2)}")
    }
  }

  test("null propagates; width guard sees the kernels as costly row work") {
    val df = Seq((1, Option.empty[String]), (2, Some("a<b>c!"))).toDF("id", "t")
    val out = df.select(
        TextScanExpressions.cleanScrub(col("t")).as("k"),
        TextScanExpressions.punctCount(col("t")).as("p"))
      .collect().sortBy(_.isNullAt(0))
    assert(out(0).getString(0) == "ac" && out(0).getInt(1) == 3)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    // the widen rule keys on CostlyTextKernel: a narrow source under a
    // kernel-only projection must still widen (regex detection used to
    // carry this query shape)
    val narrow = (1 to 50).map(i => (i, s"<b>doc $i</b>")).toDF("id", "t").coalesce(1)
    val widened = graft.operators.Shuffle.widenPlan(narrow, 4)(
      _.select(col("id"), TextScanExpressions.cleanScrub(col("t")).as("c")))
    val n = widened.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition if r.shuffle => r
    }.size
    assert(n == 1, "kernel projection on a 1-partition source must widen")
  }
}
