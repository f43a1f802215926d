package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  test("unigramSurprisal matches a hand-computed tiny corpus") {
    import spark.implicits._
    // corpus: "a a b" + "b c" → N=5 tokens, V=3 types
    // counts: a=2, b=2, c=1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val out = CorpusStats.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def surp(cnt: Long): Long =
      math.floor(1e6 * math.log(8.0 / (cnt + 1).toDouble)).toLong // N+V=8
    val d1 = (surp(2) + surp(2) + surp(2)).toDouble / (3 * 1000000).toDouble
    val d2 = (surp(2) + surp(1)).toDouble / (2 * 1000000).toDouble
    assert(out(1L)._1 == d1 && out(1L)._2 == 3L)
    assert(out(2L)._1 == d2 && out(2L)._2 == 2L)
    // rarer tokens → higher surprisal
    assert(out(2L)._1 > out(1L)._1)
  }

  test("tokenTvDistance: identical distributions → 0, disjoint → 1") {
    import spark.implicits._
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val tvSame = CorpusStats.tokenTvDistance(same, "g", "text", "a", "b")
      .head().getDouble(4)
    assert(tvSame == 0.0)
    val disj = Seq(("a", "x x y"), ("b", "p q q q")).toDF("g", "text")
    val tvDisj = CorpusStats.tokenTvDistance(disj, "g", "text", "a", "b")
      .head().getDouble(4)
    assert(tvDisj == 1.0)
  }

  test("tokenTvDistance fails loudly on an empty group") {
    import spark.implicits._
    val docs = Seq(("a", "x y")).toDF("g", "text")
    intercept[IllegalArgumentException](
      CorpusStats.tokenTvDistance(docs, "g", "text", "a", "nope"))
  }

  test("tokenTvDistance hand-case is exact") {
    import spark.implicits._
    // a: {x:2, y:1} N=3;  b: {x:1, y:2} N=3
    // num = |2*3-1*3| + |1*3-2*3| = 6; tv = 6 / (2*9) = 1/3
    val docs = Seq(("a", "x x y"), ("b", "x y y")).toDF("g", "text")
    val r = CorpusStats.tokenTvDistance(docs, "g", "text", "a", "b").head()
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 6.0 / 18.0)
  }
}
