package graft.pipeline

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  test("chunk geometry: stride, overlap, and coverage") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = TrainingData.chunkText(df, "id", "text", chunkChars = 100, overlap = 20)
      .orderBy("chunk_idx").collect()
    // stride 80: chunks at 0, 80, 160 -> covers through 260
    assert(chunks.length == 3)
    val texts = chunks.map(_.getAs[String]("chunk_text"))
    assert(texts(0) == text.substring(0, 100))
    assert(texts(1) == text.substring(80, 180))
    assert(texts(2) == text.substring(160, 260))
    // consecutive chunks overlap by exactly `overlap` chars
    assert(texts(0).takeRight(20) == texts(1).take(20))
    // full coverage: every char position falls inside some chunk
    assert(chunks.map(_.getAs[Int]("chunk_chars")).sum >= text.length)
  }

  test("short documents yield exactly one chunk") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "x" * 100)).toDF("id", "text")
    val out = TrainingData.chunkText(df, "id", "text", chunkChars = 100, overlap = 20)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("boundary: len exactly chunkChars + stride yields two chunks") {
    import spark.implicits._
    val df = Seq((1L, "y" * 180)).toDF("id", "text") // 100 + 80
    val n = TrainingData.chunkText(df, "id", "text", chunkChars = 100, overlap = 20).count()
    assert(n == 2)
  }

  test("column names needing backtick quoting work (no SQL-string splicing)") {
    import spark.implicits._
    val df = Seq((1L, "z" * 180)).toDF("id", "doc text") // space in the name
    val out = TrainingData.chunkText(df, "id", "doc text", chunkChars = 100, overlap = 20)
      .orderBy("chunk_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("chunk_text") == "z" * 100)
  }

  test("rejects overlap >= chunkChars") {
    import spark.implicits._
    val df = Seq((1L, "abc")).toDF("id", "text")
    intercept[IllegalArgumentException](
      TrainingData.chunkText(df, "id", "text", chunkChars = 50, overlap = 50))
  }
}
