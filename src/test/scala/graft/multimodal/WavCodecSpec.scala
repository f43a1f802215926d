package graft.multimodal

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  private val dir = graft.Queries.audioFixtureDir

  private def load(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(dir, name))

  /** Independent reference decode in plain Scala over the same fixture
    * bytes (fixed canonical offsets — the generator documents them).
    */
  private def reference(b: Array[Byte]): (Int, Int, Long, Int, Long) = {
    def u16(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (0 to 3).map(k => (b(o + k) & 0xFFL) << (8 * k)).sum
    val channels = u16(22)
    val rate = u32(24).toInt
    // locate 'data' marker (unique in fixtures)
    val mkr = b.indices.find(i => i + 4 <= b.length &&
      b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a').get
    val len = u32(mkr + 4).toInt
    val ds = mkr + 8
    var peak = 0; var sum = 0L
    for (i <- 0 until len / 2) {
      val raw = (b(ds + 2 * i) & 0xFF) | ((b(ds + 2 * i + 1) & 0xFF) << 8)
      val v = if (raw >= 0x8000) raw - 0x10000 else raw
      val a = math.abs(v)
      if (a > peak) peak = a
      sum += a
    }
    (rate, channels, len.toLong / 2 / channels, peak, sum)
  }

  test("decode matches an independent fixed-offset reference on every fixture") {
    for (name <- Seq("tone_mono_8k.wav", "noise_stereo_16k.wav", "tagged_mono_44k.wav")) {
      val b = load(name)
      val got = WavCodec.decode(b)
      val (rate, ch, frames, peak, sum) = reference(b)
      assert(got.sampleRate == rate, name)
      assert(got.channels == ch, name)
      assert(got.nFrames == frames, name)
      assert(got.peakAbs == peak, name)
      assert(got.absSum == sum, name)
      assert(got.bitsPerSample == 16)
    }
  }

  test("chunk walk skips the LIST chunk (data not at offset 44)") {
    val b = load("tagged_mono_44k.wav")
    // fixture carries a LIST chunk between fmt and data
    assert(new String(b.slice(36, 40), "US-ASCII") == "LIST")
    val got = WavCodec.decode(b)
    assert(got.sampleRate == 44100 && got.channels == 1)
    assert(got.nFrames == 1500)
  }

  test("signed extremes decode correctly (first two samples are -32768/32767)") {
    val got = WavCodec.decode(load("tone_mono_8k.wav"))
    assert(got.peakAbs == 32768) // |−32768|
  }

  test("rejects non-WAV and non-PCM payloads loudly") {
    intercept[IllegalArgumentException](WavCodec.decode("nope".getBytes))
    val b = load("tone_mono_8k.wav").clone()
    b(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](WavCodec.decode(b))
  }

  test("corrupt chunk length throws instead of hanging the walk") {
    val b = load("tone_mono_8k.wav").clone()
    // declare the fmt chunk length as 0xFFFFFFF8: toInt-negative, the
    // old walk advanced by zero bytes forever
    b(16) = 0xF8.toByte; b(17) = 0xFF.toByte; b(18) = 0xFF.toByte; b(19) = 0xFF.toByte
    intercept[IllegalArgumentException](WavCodec.decode(b))
  }

  test("short fmt chunk throws instead of reading the next chunk's bytes") {
    val b = load("tone_mono_8k.wav").clone()
    // declare the fmt chunk as 12 bytes — shorter than the 16-byte PCM
    // block whose fields the decoder reads
    b(16) = 12; b(17) = 0; b(18) = 0; b(19) = 0
    val e = intercept[IllegalArgumentException](WavCodec.decode(b))
    assert(e.getMessage.contains("fmt chunk too short"))
  }

  test("isWav discriminates") {
    assert(WavCodec.isWav(load("noise_stereo_16k.wav")))
    assert(!WavCodec.isWav(Array[Byte](1, 2, 3)))
    assert(!WavCodec.isWav(null))
  }
}
