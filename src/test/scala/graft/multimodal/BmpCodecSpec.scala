package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the real BMP decoder over the committed fixtures
  * (tools/make_bmp_fixtures.py), plus the padding case the unpadded
  * fixtures can't exercise.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/img/$name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the fixture BMPs to known dims and pixel checksums") {
    val expected = Map(
      "solid.bmp" -> 3840L,     // 64 px * (10+20+30)
      "gradient.bmp" -> 5376L,
      "stripes.bmp" -> 20416L)  // 4 rows * 8 * 255 + 4 rows * 8 * 383
    expected.foreach { case (name, sum) =>
      val img = BmpCodec.decode(fixture(name))
      assert(img.width == 8 && img.height == 8 && img.channels == 3, name)
      assert(img.pixelSum == sum, s"$name pixelSum=${img.pixelSum}")
    }
  }

  test("pixel checksum excludes row padding") {
    // 3x2, 24bpp: rows are 9 pixel bytes + 3 padding bytes (stride 12).
    // Fill padding with 0xFF — a stride bug would inflate the sum by 6*255.
    val width = 3; val height = 2
    val stride = 12
    val pix = Array.tabulate(height, stride) { (_, i) =>
      if (i < width * 3) 1.toByte else 0xFF.toByte
    }
    val bb = java.nio.ByteBuffer.allocate(54 + stride * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * height)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    pix.foreach(bb.put)
    val img = BmpCodec.decode(bb.array())
    assert(img.width == 3 && img.height == 2)
    assert(img.pixelSum == width * 3 * height) // 18, not 18 + 6*255
  }

  test("top-down (negative height) BMPs decode with the same checksum") {
    val base = fixture("solid.bmp")
    val flipped = base.clone()
    // height i32 at offset 22 -> -8
    val bb = java.nio.ByteBuffer.wrap(flipped).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -8)
    val img = BmpCodec.decode(flipped)
    assert(img.height == 8 && img.pixelSum == 3840L)
  }

  test("rejects non-BMP and unsupported variants loudly") {
    intercept[IllegalArgumentException](BmpCodec.decode("not a bitmap at all, just text".getBytes))
    val bad = fixture("solid.bmp").clone()
    val bb = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(28, 8.toShort) // bpp 8 — unsupported
    intercept[IllegalArgumentException](BmpCodec.decode(bad))
  }

  test("decodeAny dispatches BMP to the real codec, other bytes to the stub") {
    val (w, h, c, sum) = Multimodal.decodeAny(fixture("gradient.bmp"))
    assert((w, h, c, sum) == (8, 8, 3, 5376L))
    val (sw, sh, sc, _) = Multimodal.decodeAny("plain text".getBytes)
    assert(sw >= 1 && sh >= 1 && sc == 3) // stub shape
  }
}
