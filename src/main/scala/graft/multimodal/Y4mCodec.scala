package graft.multimodal

/** Stream-level header + per-stream frame count. */
final case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
    colorspace: String, nFrames: Int)

/** Integer-exact luma features of one frame (unsigned-byte plane):
  * oracle-checkable without any float arithmetic.
  */
final case class Y4mFrameFeatures(idx: Int, lumaSum: Long, lumaMin: Int, lumaMax: Int)

/** Minimal real YUV4MPEG2 (.y4m) parser — the uncompressed video
  * interchange format of mjpegtools/ffmpeg: an ASCII stream header
  * (`YUV4MPEG2 W<w> H<h> F<num>:<den> ...\n`), then per frame an ASCII
  * `FRAME[ params]\n` marker followed by raw planar YUV bytes (4:2:0 →
  * w·h luma + 2·(w/2)·(h/2) chroma). Fixed frame size makes the k-th
  * frame a pure offset computation — the property real video samplers
  * exploit for keyframe-free seeking.
  *
  * Same contract as BmpCodec/WavCodec (the round 4-6 stub replacements):
  * decode what the format guarantees, throw loudly on anything malformed
  * (bad magic, unsupported colorspace, missing FRAME marker, truncated
  * frame) — silently-wrong features are worse than a failed row. The
  * remaining frameSampleStub in Multimodal covers opaque payloads; this
  * codec makes the video path REAL for the one container that needs no
  * entropy decoder.
  */
object Y4mCodec {

  private val Magic = "YUV4MPEG2 "

  def isY4m(b: Array[Byte]): Boolean =
    b != null && b.length > Magic.length &&
      new String(b, 0, Magic.length, "US-ASCII") == Magic

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != 0x0A) i += 1
    require(i < b.length, "Y4mCodec: unterminated header line")
    i
  }

  /** Parse the stream header; returns (video-with-zero-frames, offset of
    * the first FRAME marker, bytes per frame).
    */
  private def header(b: Array[Byte]): (Y4mVideo, Int, Int) = {
    require(isY4m(b), "Y4mCodec: not a YUV4MPEG2 payload")
    val end = lineEnd(b, 0)
    val params = new String(b, 0, end, "US-ASCII").split(' ').drop(1)
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var cs = "420" // C absent defaults to 4:2:0 per the format
    params.filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          // require-then-assign: destructuring a malformed rate (e.g.
          // "F25") would raise MatchError, not the contract's
          // IllegalArgumentException
          val parts = p.substring(1).split(':')
          require(parts.length == 2, s"Y4mCodec: bad frame rate '$p'")
          fn = parts(0).toInt; fd = parts(1).toInt
        case 'C' => cs = p.substring(1)
        case _   => () // I (interlace), A (aspect), X (extension): ignored
      }
    }
    require(w > 0 && h > 0, s"Y4mCodec: missing/invalid W/H in header")
    require(fn > 0 && fd > 0, s"Y4mCodec: missing/invalid frame rate")
    require(cs.startsWith("420"),
      s"Y4mCodec: unsupported colorspace C$cs (4:2:0 only)")
    require(w % 2 == 0 && h % 2 == 0,
      s"Y4mCodec: 4:2:0 needs even dimensions, got ${w}x$h")
    val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
    (Y4mVideo(w, h, fn, fd, cs, 0), end + 1, frameBytes)
  }

  /** Decode the stream header and count/validate every frame. */
  def decode(b: Array[Byte]): Y4mVideo = {
    val (v, start, frameBytes) = header(b)
    var off = start
    var n = 0
    while (off < b.length) {
      off = frameDataOffset(b, off)
      require(off + frameBytes <= b.length,
        s"Y4mCodec: truncated frame $n (need $frameBytes bytes at $off of ${b.length})")
      off += frameBytes
      n += 1
    }
    v.copy(nFrames = n)
  }

  /** Validate the FRAME marker line at `off`; return the offset of the
    * frame's first data byte.
    */
  private def frameDataOffset(b: Array[Byte], off: Int): Int = {
    require(off + 5 <= b.length &&
      new String(b, off, 5, "US-ASCII") == "FRAME",
      s"Y4mCodec: missing FRAME marker at offset $off")
    lineEnd(b, off) + 1
  }

  /** Integer-exact luma features of every `stride`-th frame (0, stride,
    * 2·stride, …) — the frame-sampling primitive. Seeks by arithmetic:
    * skipped frames are never touched beyond their marker line.
    */
  def sampleFrames(b: Array[Byte], stride: Int): Seq[Y4mFrameFeatures] =
    decodeAndSample(b, stride)._2

  /** One-walk combined entry point: the fully-validated stream header
    * (with total frame count) AND the sampled luma features. Callers
    * needing both (Multimodal.sampleVideoFrames) would otherwise scan
    * every payload twice — once for decode, once for sampling.
    */
  def decodeAndSample(b: Array[Byte], stride: Int): (Y4mVideo, Seq[Y4mFrameFeatures]) = {
    require(stride >= 1, s"Y4mCodec: stride must be >= 1, got $stride")
    val (v, start, frameBytes) = header(b)
    val luma = v.width * v.height
    val out = Seq.newBuilder[Y4mFrameFeatures]
    var off = start
    var idx = 0
    while (off < b.length) {
      val data = frameDataOffset(b, off)
      require(data + frameBytes <= b.length,
        s"Y4mCodec: truncated frame $idx (need $frameBytes bytes at $data of ${b.length})")
      if (idx % stride == 0) {
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < luma) {
          val p = b(data + i) & 0xFF
          sum += p
          if (p < mn) mn = p
          if (p > mx) mx = p
          i += 1
        }
        out += Y4mFrameFeatures(idx, sum, mn, mx)
      }
      off = data + frameBytes
      idx += 1
    }
    (v.copy(nFrames = idx), out.result())
  }
}
