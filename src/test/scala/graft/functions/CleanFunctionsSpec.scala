package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CleanFunctionsSpec extends SparkSpec {
  import CleanFunctions._

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  test("normalizeKey lowercases and trims") {
    assert(one(normalizeKey(lit("  Apple INC  "))) == "apple inc")
  }

  test("scrub removes tags and non-alphanumerics in one pass") {
    assert(one(scrub(lit("<b>A&B</b> c-1"))) == "AB c1")
  }

  test("cleanText is the reference two-pass clean") {
    assert(one(cleanText(lit("<p>Hello, World! 42</p>"))) == "hello world 42")
  }

  test("cleanText is idempotent (seeded property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      + "<i>#!?</i> " + rnd.nextPrintableChar())
    val df = samples.toDF("t")
    val rows = df.select(cleanText(col("t")).as("once"),
      cleanText(cleanText(col("t"))).as("twice")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("parseNumeric handles comma-grouped values (SURVEY §1.4(2))") {
    assert(one(parseNumeric(lit("559,365,151.11"))) == 5.5936515111e8)
    assert(one(parseNumeric(lit("0.02"))) == 0.02)
    assert(one(parseNumeric(lit("n/a"))) == null)
  }

  test("comma-format round-trip: format_number → parseNumeric = identity (seeded property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(100)(math.rint((rnd.nextDouble() - 0.5) * 2e12 * 100) / 100)
    val rows = vals.toDF("x").select(col("x"),
      parseNumeric(format_number(col("x"), 2), DoubleType).as("r")).collect()
    rows.foreach { r =>
      val v = r.getDouble(0); val back = r.getDouble(1)
      assert(math.abs(back - v) < 1e-6 * math.max(1.0, math.abs(v)), s"$v -> $back")
    }
  }

  test("numericWithDefault defaults AFTER the cast (SURVEY §1.4(3))") {
    assert(one(numericWithDefault(lit("garbage"), 0.0)) == 0.0)
    assert(one(numericWithDefault(lit(null).cast(StringType), 7.5)) == 7.5)
    assert(one(numericWithDefault(lit("1,000"), 0.0)) == 1000.0)
  }

  test("parseTimestamp accepts both reference dialects (SURVEY §7.4(5))") {
    val a = one(parseTimestamp(lit("2024-03-01 10:15:00")))
    val b = one(parseTimestamp(lit("2024-03-01T10:15:00Z")))
    assert(a != null && a == b) // UTC session: same instant
  }

  test("recordId is a real string concat (SURVEY §1.4(1))") {
    assert(one(recordId(lit("aapl"), lit("apple inc"))) == "aapl_apple inc")
  }

  test("assembleText fills null content") {
    assert(one(assembleText(lit("t"), lit(null).cast(StringType))) == "t ")
    assert(one(assembleText(lit("t"), lit("c"))) == "t c")
  }

  test("extractText concats null-safely and trims") {
    assert(one(extractText(Seq(lit(null).cast(StringType), lit("x")))) == "x")
  }

  test("truncate is 1-based inclusive") {
    assert(one(truncate(lit("abcdef"), 3)) == "abc")
  }
}
