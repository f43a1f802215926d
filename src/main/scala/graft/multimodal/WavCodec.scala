package graft.multimodal

/** Real (pure-Scala, zero-dependency) decoder for canonical RIFF/WAVE
  * PCM-16 audio — the audio-modality analog of BmpCodec. Header fields
  * come from a real chunk walk (not fixed offsets), then a full pass over
  * the sample region computes integer-exact signal features: peak absolute
  * amplitude and the sum of absolute sample values. A byte-order, offset,
  * or signedness bug changes the emitted numbers, which the q134 oracle
  * recomputes independently from the same bytes in DuckDB.
  *
  * Scale shape: decode runs per-row inside mapPartitions (executor-side,
  * no shuffle); payloads are KB-MB, the loop is memory-local.
  */
object WavCodec {

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, peakAbs: Int, absSum: Long)

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Signed little-endian 16-bit sample at offset `o`. */
  private def s16(b: Array[Byte], o: Int): Int = {
    val v = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    if (v >= 0x8000) v - 0x10000 else v
  }

  /** Decode header + signal features. Real chunk walk: tolerates extra
    * chunks (LIST/INFO) between fmt and data. Throws on non-WAV or
    * non-PCM-16 (loud beats silently-wrong features).
    */
  def decode(b: Array[Byte]): WavAudio = {
    require(isWav(b), "WavCodec: not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (off + 8 <= b.length && (dataOff < 0 || sampleRate < 0)) {
      val id = new String(b.slice(off, off + 4), "US-ASCII")
      val len = u32(b, off + 4)
      // a corrupt u32 length near 2^32 turns negative in toInt and would
      // stall or reverse the walk — malformed input must throw, not hang
      require(len <= Int.MaxValue - 9 && off + 8 + len <= b.length,
        s"WavCodec: corrupt chunk '$id' length $len at offset $off (payload ${b.length})")
      id match {
        case "fmt " =>
          // the PCM fmt block is 16 bytes; a shorter chunk would make the
          // field reads below spill into the next chunk's bytes
          require(len >= 16, s"WavCodec: fmt chunk too short ($len)")
          val fmt = u16(b, off + 8)
          require(fmt == 1, s"WavCodec: unsupported audio format $fmt (PCM only)")
          channels = u16(b, off + 10)
          sampleRate = u32(b, off + 12).toInt
          bits = u16(b, off + 22)
          require(bits == 16, s"WavCodec: unsupported bit depth $bits (16-bit only)")
        case "data" =>
          dataOff = off + 8
          dataLen = len
        case _ => () // skip unknown chunks
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "WavCodec: missing fmt chunk")
    require(dataOff > 0, "WavCodec: missing data chunk")
    require(dataOff + dataLen <= b.length,
      s"WavCodec: truncated data chunk (off=$dataOff len=$dataLen total=${b.length})")
    val nSamples = (dataLen / 2).toInt
    var i = 0
    var peak = 0
    var absSum = 0L
    while (i < nSamples) {
      val v = s16(b, dataOff + 2 * i)
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      absSum += a
      i += 1
    }
    WavAudio(sampleRate, channels, bits, nSamples.toLong / channels, peak, absSum)
  }
}
