package graft.vector

import org.scalatest.funsuite.AnyFunSuite

class KMeansLiteSpec extends AnyFunSuite {

  private def clustered(seed: Int, k: Int, per: Int, d: Int, spread: Double): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(k)(Array.fill(d)(rnd.nextGaussian() * 10))
    centers.flatMap(c => Array.fill(per)(c.map(v => v + rnd.nextGaussian() * spread)))
  }

  test("deterministic for a fixed seed") {
    val pts = clustered(1, 5, 50, 8, 0.3)
    val a = KMeansLite.fit(pts, 5, 20, seed = 42L)
    val b = KMeansLite.fit(pts.map(_.clone()), 5, 20, seed = 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("recovers well-separated cluster centers") {
    val pts = clustered(7, 4, 100, 6, 0.2)
    val trueCenters = {
      val rnd = new scala.util.Random(7)
      Array.fill(4)(Array.fill(6)(rnd.nextGaussian() * 10))
    }
    val fit = KMeansLite.fit(pts, 4, 30, seed = 42L)
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // every true center has a fitted center within a fraction of the
    // inter-center spacing
    trueCenters.foreach { tc =>
      val nearest = fit.map(l2(tc, _)).min
      assert(nearest < 1.0, s"nearest fitted center at $nearest")
    }
  }

  test("returns exactly k centers even when n < k") {
    val pts = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val fit = KMeansLite.fit(pts, 5, 10, seed = 1L)
    assert(fit.length == 5 && fit.forall(_.length == 2))
  }

  test("k=1 yields the mean") {
    val pts = Array(Array(0.0, 0.0), Array(2.0, 4.0), Array(4.0, 2.0))
    val fit = KMeansLite.fit(pts, 1, 10, seed = 1L)
    assert(fit.length == 1)
    assert(math.abs(fit(0)(0) - 2.0) < 1e-12 && math.abs(fit(0)(1) - 2.0) < 1e-12)
  }

  test("duplicate-heavy input does not produce NaN centers") {
    val pts = Array.fill(100)(Array(1.0, 1.0)) ++ Array(Array(5.0, 5.0))
    val fit = KMeansLite.fit(pts, 4, 10, seed = 3L)
    assert(fit.forall(_.forall(v => !v.isNaN)))
  }
}
