package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  test("tokenCount counts whitespace tokens") {
    assert(one(tokenCount(lit("  a b\tc  "))) == 3)
  }

  test("bpeishCount: letter runs 1, digits each, punct each") {
    // "ab 12, c!" -> [ab][1][2][,][c][!] = 6
    assert(one(bpeishCount(lit("ab 12, c!"))) == 6)
  }

  test("punctCount counts scrubbed characters") {
    assert(one(punctCount(lit("a,b!c"))) == 2)
  }

  test("shingles: 3-grams of cleaned text, distinct, empty when too short") {
    val s = one(shingles(lit("The quick brown fox jumps"), 3)).asInstanceOf[collection.Seq[String]]
    assert(s.toSeq == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    val short = one(shingles(lit("one two"), 3)).asInstanceOf[collection.Seq[String]]
    assert(short.isEmpty)
  }

  test("fingerprint is invariant to case/punctuation/spacing noise") {
    val a = one(fingerprint(lit("Hello,   World!")))
    val b = one(fingerprint(lit("hello world")))
    val c = one(fingerprint(lit("hello  world?")))
    assert(a == b && b == c)
    assert(a != one(fingerprint(lit("goodbye world"))))
  }

  test("rollingFingerprint is order-sensitive and noise-invariant") {
    val a = one(rollingFingerprint(lit("Alpha, beta gamma!")))
    val b = one(rollingFingerprint(lit("alpha beta   gamma")))
    val swapped = one(rollingFingerprint(lit("beta alpha gamma")))
    assert(a == b)        // case/punct/spacing noise collapses
    assert(a != swapped)  // token order matters (unlike a set hash)
  }

  test("langId picks the language with most marker hits") {
    assert(one(langId(lit("the cat and the dog is in a house"))) == "en")
    assert(one(langId(lit("el perro y la casa de los gatos"))) == "es")
    assert(one(langId(lit("zzz qqq xxx"))) == "und")
  }

  test("qualityScore rewards prose and is in [0,1]") {
    val prose = one(qualityScore(lit(
      "The quick brown fox jumps over the lazy dog and runs to the forest in the morning light"))).asInstanceOf[Double]
    val junk = one(qualityScore(lit("@@@ ### !!! %%% &&&"))).asInstanceOf[Double]
    assert(prose > junk)
    assert(prose >= 0.0 && prose <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("sentences splits and drops empties") {
    val s = one(sentences(lit("First one. Second!  Third? "))).asInstanceOf[collection.Seq[String]]
    assert(s.toSeq == Seq("First one", "Second", "Third"))
  }
}
