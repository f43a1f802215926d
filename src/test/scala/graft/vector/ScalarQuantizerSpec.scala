package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class ScalarQuantizerSpec extends SparkSpec {

  private def mkVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f))
    }
  }

  test("encode: codes bounded, scale = peak/127, reconstruction within scale/2") {
    import spark.implicits._
    val dim = 16
    val vecs = mkVecs(50, dim, 3L)
    val df = vecs.toDF("id", "vec")
    val enc = ScalarQuantizer.encode(df, "vec", dim).select("id", "vec", "sq").collect()
    for (r <- enc) {
      val vec = r.getSeq[Float](1)
      val sq = r.getStruct(2)
      val scale = sq.getFloat(0)
      val codes = sq.getSeq[Byte](1)
      val peak = vec.map(math.abs).max
      assert(math.abs(scale - peak / 127f) < 1e-6f)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // component-wise reconstruction error bound: half a quantization step
      vec.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-6, s"x=$x c=$c scale=$scale")
      }
    }
  }

  test("zero vector encodes to scale 0 / all-zero codes") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.0f))).toDF("id", "vec")
    val sq = ScalarQuantizer.encode(df, "vec", 8).select("sq").head().getStruct(0)
    assert(sq.getFloat(0) == 0.0f)
    assert(sq.getSeq[Byte](1).forall(_ == 0))
  }

  test("interpreted eval matches codegen (wholestage off vs on)") {
    import spark.implicits._
    val df = mkVecs(20, 12, 9L).toDF("id", "vec")
    def run(cg: Boolean) = {
      spark.conf.set("spark.sql.codegen.wholeStage", cg.toString)
      try ScalarQuantizer.encode(df, "vec", 12)
        .select(col("id"), col("sq.scale"), col("sq.codes"))
        .collect().map(r => (r.getLong(0), r.getFloat(1), r.getSeq[Byte](2))).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run(cg = true) == run(cg = false))
  }

  test("search recall >= 0.9 vs exact IP top-k on planted near-copies") {
    import spark.implicits._
    val dim = 32
    val base = mkVecs(500, dim, 17L)
    val probe = base.head._2
    // planted near-copies of the probe (ids 1000+)
    val planted = (1 to 12).map { i =>
      (1000L + i, probe.map(x => x * (1f + i * 0.001f)))
    }
    val pool = (base.tail ++ planted).toDF("id", "vec")
    val enc = ScalarQuantizer.encode(pool, "vec", dim)
    val ann = ScalarQuantizer.search(enc, "id", "vec", "sq", probe, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.topK(pool, "id", "vec", probe, 10, Similarity.InnerProduct)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ann.intersect(exact).size >= 9, s"ann=$ann exact=$exact")
  }

  test("approxIp is close to the exact inner product") {
    import spark.implicits._
    val dim = 24
    val vecs = mkVecs(100, dim, 23L)
    val q = vecs.head._2
    val df = vecs.toDF("id", "vec")
    val rows = ScalarQuantizer.encode(df, "vec", dim)
      .select(col("id"),
        ScalarQuantizer.approxIp(col("sq"), q).as("aip"),
        graft.functions.VectorFunctions.dot(col("vec"), Similarity.vecLit(q)).as("ip"))
      .collect()
    for (r <- rows) {
      val (aip, ip) = (r.getDouble(1), r.getDouble(2))
      // error bound: sum of |q_i| * scale/2; loose blanket bound instead
      assert(math.abs(aip - ip) < 0.05 * dim, s"aip=$aip ip=$ip")
    }
  }
}
