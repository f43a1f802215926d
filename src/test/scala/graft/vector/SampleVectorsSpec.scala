package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The content-addressed training sampler (KMeansLite.sampleVectors) —
  * the determinism contract the r13 chaos straddle phase pins at scale,
  * here pinned cheaply at unit scale, plus the round-14 fraction-trim
  * edges the r13 ADVICE flagged (sub-resolution fractions silently
  * selecting nothing; duplicate rows passing the trim atomically).
  */
class SampleVectorsSpec extends SparkSpec {

  private def vecs(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "v")
  }

  private def sig(s: Array[Array[Double]]): Seq[Seq[Double]] = s.map(_.toSeq).toSeq

  test("sample is a pure function of content: layout/partitioning invariant") {
    val base = vecs(500, 7)
    val a = KMeansLite.sampleVectors(base.repartition(1), "v", 1.0, 64, 42L)
    val b = KMeansLite.sampleVectors(base.repartition(13, col("id")), "v", 1.0, 64, 42L)
    val c = KMeansLite.sampleVectors(base.orderBy(desc("id")), "v", 1.0, 64, 42L)
    assert(sig(a) == sig(b) && sig(b) == sig(c))
    assert(a.length == 64)
  }

  test("fraction trim is deterministic, content-addressed, and duplicate-atomic") {
    import spark.implicits._
    val base = vecs(400, 11)
    // fraction path: same content + seed => same trimmed sample
    val a = KMeansLite.sampleVectors(base, "v", 0.25, 1000, 9L)
    val b = KMeansLite.sampleVectors(base.repartition(7), "v", 0.25, 1000, 9L)
    assert(sig(a) == sig(b))
    assert(a.nonEmpty && a.length < 400, s"trim kept ${a.length} of 400")
    // duplicate atomicity: every copy of a content-equal row lands on the
    // same side of the hash-range threshold, so doubling the corpus can
    // only double multiplicities, never split a duplicate group
    val doubled = base.union(base)
    val d = KMeansLite.sampleVectors(doubled, "v", 0.25, 10000, 9L)
    val dCounts = sig(d).groupBy(identity).view.mapValues(_.size).toMap
    assert(dCounts.values.forall(_ % 2 == 0),
      "a duplicated vector appeared an odd number of times — the trim split a content-equal group")
    assert(dCounts.keySet == sig(KMeansLite.sampleVectors(base, "v", 0.25, 10000, 9L)).toSet)
  }

  test("fractions below the 1e-6 trim resolution are rejected loudly") {
    val base = vecs(10, 3)
    val e = intercept[IllegalArgumentException] {
      KMeansLite.sampleVectors(base, "v", 1e-7, 16, 1L)
    }
    assert(e.getMessage.contains("trim resolution"))
    // the boundary itself is fine: exactly 1e-6 keeps threshold 1
    KMeansLite.sampleVectors(base, "v", 1e-6, 16, 1L)
  }
}
