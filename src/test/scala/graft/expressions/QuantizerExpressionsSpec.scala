package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Codegen-vs-interpreted parity and semantics for the constant-bank
  * kernels. The DataFrame path exercises the generated Java; calling
  * `nullSafeEval` through a no-codegen session config isn't necessary —
  * instead each kernel's semantics are checked against an independent
  * Scala reimplementation on the same data.
  */
class QuantizerExpressionsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private val dim = 8
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    (0L until 64L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }
  private lazy val df = {
    import spark.implicits._
    vecs.toDF("id", "v")
  }

  test("NearestCentroid matches a driver-side argmin (first-index ties)") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextFloat()))
    val got = df.select(col("id"),
        QuantizerExpressions.nearestCentroid(col("v"), centers).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val dists = centers.map(c =>
        v.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
      val want = dists.indexOf(dists.min)
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
  }

  test("NearestCentroids: head is the argmin; extras only within the margin; ascending") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextFloat()))
    val margin = 0.4
    val got = df.select(col("id"),
        QuantizerExpressions.nearestCentroids(col("v"), centers, 3, margin).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val dists = centers.map(c =>
        v.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
      val ranked = dists.zipWithIndex.sortBy { case (d, i) => (d, i) }
      val cut = ranked.head._1 * (1.0 + margin)
      // want: the ranked prefix (max 3) whose distances stay within margin
      val want = ranked.take(3).takeWhile(_._1 <= cut).map(_._2).toSeq
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
      // the head always equals the single-probe assignment
      assert(got(id).head == dists.indexOf(dists.min))
    }
  }

  test("NearestCentroids with margin 0 degenerates to the single nearest id") {
    val rnd = new scala.util.Random(6)
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextFloat()))
    val rows = df.select(col("id"),
        QuantizerExpressions.nearestCentroids(col("v"), centers, 4, 0.0).as("cs"),
        QuantizerExpressions.nearestCentroid(col("v"), centers).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == Seq(r.getInt(2)), s"id=${r.getLong(0)}")
    }
  }

  test("NearestCentroid throws loudly on a dimension mismatch") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val centers = Array.fill(2)(Array.fill(dim)(0.5f))
    val e = intercept[Exception] {
      bad.select(QuantizerExpressions.nearestCentroid(col("v"), centers)).collect()
    }
    assert(e.getMessage.contains("nearest_centroid") ||
      e.getCause != null && e.getCause.getMessage.contains("nearest_centroid"))
  }

  test("PqEncode matches per-subspace argmin; PqAdc matches table lookups") {
    val rnd = new scala.util.Random(9)
    val m = 4; val dsub = dim / m; val ksub = 8
    val codebooks = Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(rnd.nextFloat())))
    val lut = Array.fill(m)(Array.fill(ksub)(rnd.nextDouble()))
    val rows = df.select(col("id"),
        QuantizerExpressions.pqEncode(col("v"), codebooks).as("code"))
      .withColumn("adc", QuantizerExpressions.pqAdc(col("code"), lut))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSeq
    val byId = vecs.toMap
    rows.foreach { case (id, code, adc) =>
      val v = byId(id)
      val want = (0 until m).map { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        val dists = codebooks(j).map(c =>
          sub.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
        dists.indexOf(dists.min)
      }
      assert(code == want, s"id=$id")
      val wantAdc = (0 until m).map(j => lut(j)(code(j))).sum
      assert(math.abs(adc - wantAdc) < 1e-12)
    }
  }

  test("HyperplaneSignatures: table-tagged, sign-correct, scale-invariant") {
    val rnd = new scala.util.Random(3)
    val tables = 3; val bits = 5
    val planes = Array.fill(tables)(Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val got = df.select(col("id"),
        QuantizerExpressions.hyperplaneSigs(col("v"), planes).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byId = vecs.toMap
    // sign-correct vs driver-side dot products, tag in the high bits
    got.foreach { case (id, sigs) =>
      assert(sigs.length == tables)
      sigs.zipWithIndex.foreach { case (sig, t) =>
        assert((sig >> 48) == t)
        (0 until bits).foreach { b =>
          val dot = byId(id).zip(planes(t)(b))
            .map { case (x, p) => x.toDouble * p.toDouble }.sum
          val bit = (sig >> b) & 1L
          assert(bit == (if (dot >= 0.0) 1L else 0L), s"id=$id t=$t b=$b")
        }
      }
    }
    // positive scaling preserves every sign bit (the q53 planted-pair law)
    import spark.implicits._
    val scaled = vecs.map { case (i, v) => (i, v.map(x => x * 2.0f)) }.toDF("id", "v")
    val got2 = scaled.select(col("id"),
        QuantizerExpressions.hyperplaneSigs(col("v"), planes).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == got2)
  }

  test("null input yields null, not a crash") {
    import spark.implicits._
    val centers = Array.fill(2)(Array.fill(dim)(0.1f))
    val withNull = Seq((1L, Some(Seq.fill(dim)(0.5f))), (2L, None))
      .toDF("id", "v")
    val out = withNull.select(col("id"),
        QuantizerExpressions.nearestCentroid(col("v"), centers).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1L) != null && out(2L) == null)
  }
}
