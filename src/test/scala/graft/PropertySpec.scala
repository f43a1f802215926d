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

  test("fused clean: one alternation pass == reference two-pass (tags then scrub)") {
    // CleanFunctions.cleanLowered ships the fused form; this property pins
    // it to the reference's literal semantics on adversarial inputs —
    // nested/unclosed/adjacent tags, tag-chars in the char-class, and
    // whitespace inside tags — over the SAME Java regex engine Spark uses
    val tagish = Gen.oneOf("<", ">", "<b>", "</b>", "<a href='x'>", "< <x> >",
      "<<b>>", "<ab", "a>b", "<>", "< >", "<x\ny>")
    val plain = Gen.oneOf("the", "Qux9", "a,b.", "!!!", "  ", "é", "x")
    val doc = Gen.listOfN(12, Gen.oneOf(tagish, plain)).map(_.mkString(""))
    check(forAll(doc) { raw =>
      val s = raw.toLowerCase
      val twoPass = s.replaceAll("<.*?>", "").replaceAll("[^a-z0-9\\s]", "")
      val fused = s.replaceAll("<.*?>|[^a-z0-9\\s]", "")
      fused == twoPass
    })
  }

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

  test("RuleNer: every emitted entity's offsets slice back to exactly its text") {
    import graft.text.RuleNer
    // mixed soup of gazetteer hits, capitalized runs, money, percents,
    // plain words — the O29 offset-preserving contract must hold on all
    val token = Gen.oneOf(
      Gen.oneOf("apple", "Tesla", "nasdaq", "America"),
      Gen.oneOf("$1,200", "$5", "42%", "7.5%"),
      Gen.oneOf("Federal Reserve", "Quarterly Report"),
      word)
    val text = Gen.listOfN(10, token).map(_.mkString(" "))
    check(forAll(text) { t =>
      RuleNer.extract(1L, t).forall(e =>
        e.begin >= 0 && e.end <= t.length &&
          t.substring(e.begin, e.end) == e.entity)
    })
  }

  // ------------------------------------------------ codec roundtrips

  /** Build a YUV4MPEG2 stream from generated geometry + plane bytes. */
  private def buildY4m(w: Int, h: Int, frames: Seq[Array[Byte]],
      frameParams: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1\n".getBytes("US-ASCII"))
    frames.foreach { f =>
      out.write(s"FRAME$frameParams\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }

  test("Y4mCodec roundtrip: construct-then-decode recovers geometry and luma features") {
    import graft.multimodal.Y4mCodec
    val geom = for {
      w <- Gen.choose(1, 16).map(_ * 2) // even dims
      h <- Gen.choose(1, 16).map(_ * 2)
      n <- Gen.choose(1, 6)
      params <- Gen.oneOf("", " Xt=1")
      seed <- Gen.choose(0, 10000)
    } yield (w, h, n, params, seed)
    check(forAll(geom) { case (w, h, n, params, seed) =>
      val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
      val frames = (0 until n).map { i =>
        Array.tabulate(frameBytes)(j => ((seed + 31 * i + j) % 256).toByte)
      }
      val b = buildY4m(w, h, frames, params)
      val v = Y4mCodec.decode(b)
      val feats = Y4mCodec.sampleFrames(b, 1)
      val lumaOk = feats.zipWithIndex.forall { case (f, i) =>
        val luma = frames(i).take(w * h).map(_ & 0xFF)
        f.lumaSum == luma.map(_.toLong).sum && f.lumaMin == luma.min && f.lumaMax == luma.max
      }
      v.width == w && v.height == h && v.nFrames == n && feats.size == n && lumaOk
    })
  }

  test("Y4mCodec sampleFrames: stride selects exactly the multiples") {
    import graft.multimodal.Y4mCodec
    val geom = Gen.zip(Gen.choose(1, 8), Gen.choose(1, 5))
    check(forAll(geom) { case (n, stride) =>
      val frames = (0 until n).map(_ => Array.fill(2 * 2 + 2)(7.toByte))
      val idx = Y4mCodec.sampleFrames(buildY4m(2, 2, frames), stride).map(_.idx)
      idx == (0 until n by stride).toSeq
    })
  }

  test("Y4mCodec: any truncation of the plane bytes throws, never mis-decodes") {
    import graft.multimodal.Y4mCodec
    val cut = Gen.choose(1, 11) // strictly inside the final 12-byte frame
    check(forAll(cut) { c =>
      val b = buildY4m(2, 2, Seq(Array.fill(6)(1.toByte), Array.fill(6)(2.toByte)))
      Prop.throws(classOf[IllegalArgumentException])(Y4mCodec.decode(b.dropRight(c)))
    })
  }

  /** Build a canonical 24-bit BI_RGB BMP with the mandated row padding. */
  private def buildBmp(w: Int, h: Int, pix: (Int, Int) => Int,
      padByte: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + stride * h)
    bb.putInt(0); bb.putInt(54) // reserved, pixel offset
    bb.putInt(40); bb.putInt(w); bb.putInt(h) // BITMAPINFOHEADER
    bb.putShort(1); bb.putShort(24); bb.putInt(0) // planes, bpp, BI_RGB
    bb.putInt(stride * h); bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    for (y <- 0 until h) {
      for (x <- 0 until w * 3) bb.put((pix(x, y) & 0xFF).toByte)
      for (_ <- w * 3 until stride) bb.put((padByte & 0xFF).toByte)
    }
    bb.array()
  }

  test("BmpCodec roundtrip: pixel sum excludes padding regardless of its content") {
    import graft.multimodal.BmpCodec
    val gen = for {
      w <- Gen.choose(1, 9) // odd widths force nonzero padding
      h <- Gen.choose(1, 6)
      seed <- Gen.choose(0, 10000)
      pad <- Gen.oneOf(0, 0xFF) // pad bytes must never leak into the sum
    } yield (w, h, seed, pad)
    check(forAll(gen) { case (w, h, seed, pad) =>
      def pix(x: Int, y: Int): Int = (seed + 7 * x + 13 * y) % 256
      val img = BmpCodec.decode(buildBmp(w, h, pix, pad))
      val expected = (for (y <- 0 until h; x <- 0 until w * 3) yield pix(x, y).toLong).sum
      img.width == w && img.height == h && img.pixelSum == expected
    })
  }

  /** Build a canonical RIFF/WAVE PCM-16 from generated samples. */
  private def buildWav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 2 * samples.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(2 * samples.length)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("WavCodec roundtrip: construct-then-decode recovers header and signal features") {
    import graft.multimodal.WavCodec
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      channels <- Gen.choose(1, 2)
      n <- Gen.choose(1, 50).map(_ * channels) // whole frames
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, channels, samples.toArray)
    check(forAll(gen) { case (rate, channels, samples) =>
      val a = WavCodec.decode(buildWav(rate, channels, samples))
      val abs = samples.map(s => math.abs(s.toLong))
      a.sampleRate == rate && a.channels == channels &&
        a.nFrames == samples.length / channels &&
        a.peakAbs == abs.max && a.absSum == abs.sum
    })
  }
}
