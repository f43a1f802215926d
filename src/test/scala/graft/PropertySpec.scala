package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure kernels whose edge cases hand-written
  * examples sample thinly: the scale cipher, chunk geometry, and the
  * Morton interleave. Each property is the invariant the corresponding
  * gate or proof RELIES on, checked over generated inputs.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a property with 200 cases; fail the test with the result status. */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val sentence = Gen.listOfN(8, word).map(_.mkString(" "))
  private val replica = Gen.choose(1, 311)

  test("cipher: bijective per replica — equal iff inputs equal") {
    check(forAll(sentence, sentence, replica) { (a, b, r) =>
      val (ca, cb) = (ScaleData.cipher(a, r), ScaleData.cipher(b, r))
      (ca == cb) == (a == b)
    })
  }

  test("cipher: length and whitespace structure always preserved") {
    check(forAll(sentence, replica) { (s, r) =>
      val c = ScaleData.cipher(s, r)
      c.length == s.length &&
        c.zip(s).forall { case (cc, sc) => cc.isWhitespace == sc.isWhitespace }
    })
  }

  test("cipher: applying the same replica twice is deterministic") {
    check(forAll(sentence, replica) { (s, r) =>
      ScaleData.cipher(s, r) == ScaleData.cipher(s, r)
    })
  }

  test("chunk geometry: nChunks formula covers every character exactly once per stride") {
    // mirrors TrainingData.chunkText's pure arithmetic: for any len and
    // valid (chunkChars, overlap), chunks tile the document — first chunk
    // starts at 0, last chunk reaches the end, consecutive starts differ
    // by stride
    val geom = for {
      chunk <- Gen.choose(2, 300)
      overlap <- Gen.choose(0, chunk - 1)
      len <- Gen.choose(1, 5000)
    } yield (chunk, overlap, len)
    check(forAll(geom) { case (chunk, overlap, len) =>
      val stride = chunk - overlap
      val extra = math.max(0L, (len.toLong - chunk + (stride - 1)) / stride)
      val n = 1 + extra
      val starts = (0L until n).map(_ * stride)
      val lastEnd = starts.last + chunk
      // every chunk starts inside the doc, and the tiling reaches the end
      Prop(starts.forall(_ < len) && lastEnd >= len) :| s"n=$n lastEnd=$lastEnd len=$len"
    })
  }

  test("Morton zValue: monotone in each coordinate with the other fixed at 0") {
    // pure-Scala mirror of Layout.zValue's bit interleave
    def z(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { k =>
        ((x >> k) & 1L) * (1L << (2 * k)) + ((y >> k) & 1L) * (1L << (2 * k + 1))
      }.sum
    val coord = Gen.choose(0L, (1L << 16) - 1)
    check(forAll(coord, coord) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      z(lo, 0, 16) <= z(hi, 0, 16) && z(0, lo, 16) <= z(0, hi, 16)
    })
  }

  test("Morton zValue: bijective on the 2-D grid (distinct points, distinct codes)") {
    def z(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { k =>
        ((x >> k) & 1L) * (1L << (2 * k)) + ((y >> k) & 1L) * (1L << (2 * k + 1))
      }.sum
    val pt = Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L))
    check(forAll(pt, pt) { case ((x1, y1), (x2, y2)) =>
      (z(x1, y1, 8) == z(x2, y2, 8)) == (x1 == x2 && y1 == y2)
    })
  }
}
