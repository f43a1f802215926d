package graft.multimodal

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class Y4mCodecSpec extends AnyFunSuite {

  private val dir = {
    val candidates = Seq("/root/repo/src/test/resources/video",
      new java.io.File("src/test/resources/video").getAbsolutePath)
    candidates.find(p => Files.exists(Paths.get(p))).get
  }

  private def load(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(dir, name))

  /** Independent reference: replays the generator's LCG over the same
    * geometry (tools/make_y4m_fixtures.py documents seed = 1000·i + w for
    * frame i's luma plane) and computes features with naive Scala.
    */
  private def refLuma(w: Int, h: Int, frame: Int): (Long, Int, Int) = {
    var v = 1000L * frame + w
    var sum = 0L; var mn = 255; var mx = 0
    for (_ <- 0 until w * h) {
      v = (v * 1103515245L + 12345L) % (1L << 31)
      val p = (v % 256).toInt
      sum += p
      if (p < mn) mn = p
      if (p > mx) mx = p
    }
    (sum, mn, mx)
  }

  test("decode: header fields and frame count on both fixtures") {
    val a = Y4mCodec.decode(load("clip_8x6_3f.y4m"))
    assert(a == Y4mVideo(8, 6, 25, 1, "420", 3))
    val b = Y4mCodec.decode(load("clip_4x4_5f_tagged.y4m"))
    assert(b == Y4mVideo(4, 4, 30000, 1001, "420jpeg", 5))
  }

  test("sampleFrames stride=1 matches the independent LCG recomputation") {
    val feats = Y4mCodec.sampleFrames(load("clip_8x6_3f.y4m"), 1)
    assert(feats.map(_.idx) == Seq(0, 1, 2))
    feats.foreach { f =>
      val (sum, mn, mx) = refLuma(8, 6, f.idx)
      assert((f.lumaSum, f.lumaMin, f.lumaMax) == ((sum, mn, mx)), s"frame ${f.idx}")
    }
  }

  test("stride skips frames by arithmetic (indices 0, 2, 4)") {
    val feats = Y4mCodec.sampleFrames(load("clip_4x4_5f_tagged.y4m"), 2)
    assert(feats.map(_.idx) == Seq(0, 2, 4))
    val (sum, _, _) = refLuma(4, 4, 2)
    assert(feats(1).lumaSum == sum)
  }

  test("per-frame FRAME params and header X-params are walked, not assumed") {
    // the tagged fixture has ' Xtimecode=0' on every FRAME line — decoding
    // it at all proves the parser walks marker lines instead of offsets
    assert(Y4mCodec.decode(load("clip_4x4_5f_tagged.y4m")).nFrames == 5)
  }

  test("malformed payloads throw loudly") {
    intercept[IllegalArgumentException](Y4mCodec.decode("not video".getBytes))
    val good = load("clip_8x6_3f.y4m")
    // truncate mid-frame
    intercept[IllegalArgumentException](Y4mCodec.decode(good.dropRight(10)))
    // corrupt a FRAME marker: first marker comes right after the header line
    val bad = good.clone()
    val hdrEnd = bad.indexOf(0x0A)
    bad(hdrEnd + 1) = 'X'
    intercept[IllegalArgumentException](Y4mCodec.decode(bad))
    // unsupported colorspace
    val c444 = ("YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + "x" * 12).getBytes
    intercept[IllegalArgumentException](Y4mCodec.decode(c444))
  }

  test("isY4m discriminates") {
    assert(Y4mCodec.isY4m(load("clip_8x6_3f.y4m")))
    assert(!Y4mCodec.isY4m(Array[Byte](1, 2, 3)))
    assert(!Y4mCodec.isY4m(null))
  }
}
