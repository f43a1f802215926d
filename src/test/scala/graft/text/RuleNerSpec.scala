package graft.text

import graft.SparkSpec

class RuleNerSpec extends SparkSpec {

  test("gazetteer entities carry type and exact offsets") {
    val es = RuleNer.extract(1L, "Shares of Apple rose while Amazon fell in America")
    val gaz = es.filter(e => Set("ORG", "LOC").contains(e.entity_type))
    assert(gaz.map(e => (e.entity, e.entity_type)) ==
      Seq(("Apple", "ORG"), ("Amazon", "ORG"), ("America", "LOC")))
    gaz.foreach(e => assert(
      "Shares of Apple rose while Amazon fell in America".substring(e.begin, e.end) == e.entity))
  }

  test("money and percent patterns") {
    val es = RuleNer.extract(2L, "revenue hit $15,3 billion, up 12.5% this quarter")
    assert(es.exists(e => e.entity_type == "MONEY" && e.entity.startsWith("$15")))
    assert(es.exists(e => e.entity_type == "PERCENT" && e.entity == "12.5%"))
  }

  test("capitalized runs become MISC unless covered by gazetteer or sentence-initial") {
    val es = RuleNer.extract(3L, "The Federal Reserve met on Tuesday")
    val misc = es.filter(_.entity_type == "MISC").map(_.entity)
    assert(misc.contains("Federal Reserve"))
    assert(misc.contains("Tuesday"))
    assert(!misc.contains("The")) // sentence-initial cap is not an entity
  }

  test("empty and null-safe") {
    assert(RuleNer.extract(4L, "").isEmpty)
    assert(RuleNer.extract(5L, null).isEmpty)
  }

  test("annotate explodes entities as a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, "Apple and Amazon rose 3%")).toDF("doc_id", "text")
    val out = RuleNer.annotate(df, "doc_id", "text").collect()
    assert(out.length >= 3)
    assert(out.forall(_.getLong(0) == 1L))
  }

  test("loadGazetteer: TSV roundtrip, comments skipped, malformed lines throw") {
    val p = "/tmp/graft_test_gazetteer.tsv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "# exported entities\nacme\tORG\nRuritania\tLOC\n\nsmith\tPER\n")
    val gaz = RuleNer.loadGazetteer(p)
    assert(gaz == Map("acme" -> "ORG", "ruritania" -> "LOC", "smith" -> "PER"))
    // the loaded gazetteer drives extraction exactly like the built-in one
    val ents = RuleNer.extract(1L, "Acme hired Smith in Ruritania", gaz)
    assert(ents.map(e => (e.entity, e.entity_type)).toSet ==
      Set(("Acme", "ORG"), ("Smith", "PER"), ("Ruritania", "LOC")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "acme ORG no tab\n")
    intercept[IllegalArgumentException](RuleNer.loadGazetteer(p))
  }

  test("activeGazetteer falls back to the built-in list when no file exists") {
    val p = sys.env.getOrElse("GRAFT_NER_GAZETTEER", RuleNer.DefaultGazetteerPath)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      assert(RuleNer.activeGazetteer == RuleNer.defaultGazetteer)
    else assert(RuleNer.activeGazetteer.nonEmpty)
  }
}
