package graft

import graft.SparkSpec

/** Structural guard: every registered query must run on sf0.001 and the
  * structurally-guaranteed ones must return rows. (Value-level correctness
  * is the driver's DuckDB gate at sf0.01; this spec catches analysis
  * errors and accidental schema drift early.)
  */
class QueriesSpec extends SparkSpec {

  // threshold-dependent queries may legitimately return 0 rows at tiny SF
  private val mayBeEmpty = Set("q22_ngram_jaccard", "q23_cosine_pairs",
    "q33_minhash_pairs", "q42_range_join")

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001" + (if (mayBeEmpty(name)) "" else " with rows")) {
      val n = fn(spark, TestSpark.sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(Queries.oracles.keySet.subsetOf(Queries.all.keySet))
  }

  test("every registered query is oracled") {
    // q34 (the last rows-only query) is now hard-gated too: the codegen
    // simhash kernel must equal an independent in-engine recomputation.
    // Anything missing an oracle is an unregistered-correctness bug.
    assert(Queries.all.keySet -- Queries.oracles.keySet == Set.empty[String])
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
