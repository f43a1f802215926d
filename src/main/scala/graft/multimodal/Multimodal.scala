package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.4).
  *
  * Convention: media payloads are opaque `binary` columns with typed
  * metadata (`map<string,string>`), carried through the relational pipeline
  * like any other column. Decode/feature-extraction runs batched inside
  * `mapPartitions` — the Scala analog of a vectorized Pandas-UDF stage —
  * so at scale it is a pure executor-side map with no shuffle.
  *
  * Decode: BMP payloads go through a REAL pure-Scala codec (BmpCodec,
  * header parse + padding-aware pixel checksum, oracle-verified byte-by-
  * byte in q58); other formats fall back to `decodeStub` (no image/audio
  * codec libraries in this container), which derives deterministic fake
  * features from the payload bytes. The schema, partitioning, and batch
  * shape are the same either way; a new codec touches only `decodeAny`.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature_hash", LongType)))

  /** Wrap a text/binary source into the multimodal layout. */
  def fromText(df: DataFrame, idCol: String, textCol: String, modality: String = "text"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      map(lit("origin"), lit(textCol)).as("meta"))

  /** Wrap a binaryFile scan (ingest.BinaryFileSource) into the multimodal
    * layout: content-addressed ids, the source path and size in metadata.
    */
  def fromBinaryFiles(files: DataFrame, modality: String): DataFrame =
    files.select(
      xxhash64(col("content")).as("id"),
      lit(modality).as("modality"),
      col("content").as("payload"),
      map(
        lit("path"), col("path"),
        lit("bytes"), col("length").cast(StringType)).as("meta"))

  /** Decode dispatch: REAL decode for BMP payloads (BmpCodec — header
    * dims + padding-aware pixel checksum), deterministic stub for formats
    * whose codecs aren't in this container. Feature tuple is
    * (width, height, channels, feature_hash); for BMP the hash is the
    * pixel-byte sum the q58 oracle recomputes independently.
    */
  private[multimodal] def decodeAny(payload: Array[Byte]): (Int, Int, Int, Long) =
    if (BmpCodec.isBmp(payload)) {
      val img = BmpCodec.decode(payload)
      (img.width, img.height, img.channels, img.pixelSum)
    } else decodeStub(payload)

  /** STUB decode — replace with a real codec when available. Deterministic
    * fake: dimensions and a feature hash derived from payload bytes only.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    if (payload == null || payload.isEmpty) return (0, 0, 0, 0L)
    var h = 1125899906842597L // FNV-ish rolling hash over the bytes
    payload.foreach(b => h = h * 31 + (b & 0xFF))
    val w = 1 + math.abs((h % 512).toInt)
    val ht = 1 + math.abs(((h >> 9) % 512).toInt)
    (w, ht, 3, h)
  }

  /** Batched "decode + featurize" pass: one output row per input row, with
    * the feature struct appended. `mapPartitions` keeps per-batch codec
    * setup (a real decoder's buffers/handles) amortized across the
    * partition, matching how a vectorized UDF would run.
    */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("channels", IntegerType).add("feature_hash", LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition setup for a real codec would go here
      rows.map { r =>
        val (w, h, c, fh) = decodeAny(r.getAs[Array[Byte]](payloadIdx))
        // Seq[Any] — a plain Seq(w, h, c, fh) would widen the Ints to Long
        // (weak conformance) and break the Int fields in the encoder
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, c, fh))
      }
    }(enc)
  }

  /** STUB resize — a real implementation decodes, scales, re-encodes; the
    * stub records the requested dimensions in metadata and truncates the
    * payload deterministically (so downstream sizing logic is exercisable).
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", map_concat(col("meta"),
        map(lit("resize"), lit(s"${width}x$height"))))
      .withColumn("payload",
        expr(s"substring(payload, 1, greatest(1, int(octet_length(payload) / 2)))"))

  /** STUB frame sampling for video-modality rows: emits `n` frame rows per
    * payload, each a deterministic slice with a frame index in metadata —
    * the row-explosion shape (1 video → n frames) that a real sampler has.
    */
  def frameSampleStub(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("meta", map_concat(col("meta"),
        map(lit("frame"), col("frame_idx").cast(StringType))))
      .withColumn("payload", expr(
        s"substring(payload, 1 + frame_idx * greatest(1, int(octet_length(payload) / $n)), " +
          s"greatest(1, int(octet_length(payload) / $n)))"))

  /** Cheap descriptive stats that stay in pure column expressions (and are
    * therefore oracle-checkable): byte size + content fingerprint.
    */
  def describe(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      col("modality"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("fp"))

  /** Video-modality frame sampling (REAL, Y4mCodec): explodes every
    * `stride`-th frame of each Y4M payload into a row with the stream
    * header fields and integer-exact luma features — the 1 video → n
    * frames shape with an actual container walk behind it (fixed frame
    * size ⇒ sampling seeks by arithmetic, skipped frames untouched).
    * Throws on malformed payloads, like the audio/image decoders.
    */
  def sampleVideoFrames(df: DataFrame, stride: Int): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("fps_num", IntegerType).add("fps_den", IntegerType)
      .add("n_frames", IntegerType).add("frame_idx", IntegerType)
      .add("luma_sum", LongType).add("luma_min", IntegerType)
      .add("luma_max", IntegerType)
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.getAs[Array[Byte]](payloadIdx)
        // one container walk yields both the validated header and the
        // sampled features — decode-then-sample would scan each payload twice
        val (v, frames) = Y4mCodec.decodeAndSample(b, stride)
        frames.map { f =>
          Row.fromSeq(r.toSeq ++ Seq[Any](v.width, v.height, v.fpsNum,
            v.fpsDen, v.nFrames, f.idx, f.lumaSum, f.lumaMin, f.lumaMax))
        }
      }
    }(enc)
  }

  /** Audio-modality decode (REAL, WavCodec): appends
    * (sample_rate, channels, n_frames, peak_abs, abs_sum) per row. Same
    * batched mapPartitions shape as decodeFeatures; integer-exact signal
    * features so the q134 oracle can re-derive them byte-by-byte. Throws
    * on non-WAV payloads — an audio pipeline fed video bytes should fail
    * loudly, not emit stub features.
    */
  def decodeAudioFeatures(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("sample_rate", IntegerType).add("channels", IntegerType)
      .add("n_frames", LongType).add("peak_abs", IntegerType)
      .add("abs_sum", LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val a = WavCodec.decode(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++
          Seq[Any](a.sampleRate, a.channels, a.nFrames, a.peakAbs, a.absSum))
      }
    }(enc)
  }
}
