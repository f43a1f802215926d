package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end test of the SEC ETL on a fixture shaped like the
  * reference's SEC_filings.csv (same 15 columns, comma-grouped numerics,
  * quoted fields, a duplicate holding, a null sector, an unparseable
  * value). Asserts the intended semantics of SURVEY §1.4.
  */
class SecEtlSpec extends SparkSpec {

  private lazy val fixture = getClass.getResource("/sec_fixture.csv").getPath

  private lazy val meta = {
    val raw = SecEtl.ingest(spark, fixture)
    SecEtl.extractMetadata(SecEtl.clean(raw)).cache()
  }

  test("duplicate (Ticker, Name) holdings collapse to one row") {
    assert(meta.count() == 6) // 8 data rows: one exact dup pair, one revised dup pair
    assert(meta.filter(col("ticker") === "aapl").count() == 1)
  }

  test("revised duplicate resolves by the value-column tiebreak, not arbitrarily") {
    // MSFT appears twice with different values; the ascending tiebreak on
    // Market Value (510,003,250 < 512,118,700) pins the revised row
    val msft = meta.filter(col("ticker") === "msft").collect()
    assert(msft.length == 1)
    assert(math.abs(msft.head.getAs[Float]("market_value") - 5.1000325e8f) < 1e3)
    assert(math.abs(msft.head.getAs[Float]("share_price") - 455.00f) < 1e-2)
  }

  test("comma-grouped market value parses instead of nulling (SURVEY §1.4(2))") {
    val aapl = meta.filter(col("ticker") === "aapl").head()
    assert(math.abs(aapl.getAs[Float]("market_value") - 5.59365151e8f) < 1e3)
    assert(aapl.getAs[Int]("shares_quantity") == 2752034)
  }

  test("unparseable market value defaults to 0.0 AFTER cast (SURVEY §1.4(3))") {
    val brk = meta.filter(col("ticker") === "brk.b").head()
    assert(brk.getAs[Float]("market_value") == 0.0f)
  }

  test("null sector defaults to 'unknown'") {
    val nvda = meta.filter(col("ticker") === "nvda").head()
    assert(nvda.getAs[String]("sector") == "unknown")
  }

  test("record_id is a non-null string concat (SURVEY §1.4(1))") {
    val ids = meta.select("record_id").collect().map(_.getString(0))
    assert(ids.forall(id => id != null && id.contains("_")))
    assert(ids.contains("aapl_apple inc")) // keys normalized (lower+trim) first
  }

  test("store writes single-file CSV and read-back matches count (py:296-311 contract)") {
    val back = SecEtl.store(meta, "/tmp/graft_test_sec_out")
    assert(back.count() == meta.count())
    val files = new java.io.File("/tmp/graft_test_sec_out")
      .listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // coalesce(1): exactly one part file
  }
}
