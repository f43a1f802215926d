package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val mm = {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    Multimodal.fromText(df, "doc_id", "text")
  }

  test("fromText produces the multimodal layout (binary payload + meta)") {
    val schema = mm.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "map")
    val r = mm.filter("id = 1").head()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("decodeFeatures appends deterministic stub features via mapPartitions") {
    val a = Multimodal.decodeFeatures(mm).collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("width"), r.getAs[Long]("feature_hash"))).toSet
    val b = Multimodal.decodeFeatures(mm).collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("width"), r.getAs[Long]("feature_hash"))).toSet
    assert(a == b)
    assert(a.find(_._1 == 2L).get._2 == 0) // empty payload → zero features
    assert(a.find(_._1 == 1L).get._2 > 0)
  }

  test("resizeStub halves payload and records target dims in metadata") {
    val out = Multimodal.resizeStub(mm, 64, 64).filter("id = 1").head()
    assert(out.getAs[Map[String, String]]("meta")("resize") == "64x64")
    assert(out.getAs[Array[Byte]]("payload").length == 5) // 11 bytes -> 5
  }

  test("sampleVideoFrames: real Y4M walk, distributed, stride honored") {
    import spark.implicits._
    val dir = Seq("/root/repo/src/test/resources/video",
      new java.io.File("src/test/resources/video").getAbsolutePath)
      .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))).get
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "clip_4x4_5f_tagged.y4m"))
    val df = Seq((1L, "video", bytes, Map.empty[String, String]))
      .toDF("id", "modality", "payload", "meta")
    val frames = Multimodal.sampleVideoFrames(df, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Int]("n_frames") == 5))
    assert(frames.forall(r => r.getAs[Int]("width") == 4 && r.getAs[Int]("fps_num") == 30000))
    // executor-side features equal the driver-side codec on the same bytes
    val direct = Y4mCodec.sampleFrames(bytes, 2)
    assert(frames.map(_.getAs[Long]("luma_sum")).toSeq == direct.map(_.lumaSum))
    // malformed video payloads fail the task loudly, like audio/image
    val junk = Seq((2L, "video", "garbage".getBytes, Map.empty[String, String]))
      .toDF("id", "modality", "payload", "meta")
    intercept[Exception](Multimodal.sampleVideoFrames(junk, 1).collect())
  }

  test("frameSampleStub explodes n frame rows per payload with indexed slices") {
    val frames = Multimodal.frameSampleStub(mm.filter("id = 1"), 3).collect()
    assert(frames.length == 3)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.getAs[Map[String, String]]("meta").contains("frame")))
    val slices = frames.map(r => new String(r.getAs[Array[Byte]]("payload"), "UTF-8"))
    assert(slices.mkString("").startsWith("hello wor")) // contiguous 3-byte slices
  }

  test("describe emits oracle-checkable byte stats") {
    val d = Multimodal.describe(mm).collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("n_bytes"))).toMap
    assert(d(1L) == 11 && d(2L) == 0)
  }
}
