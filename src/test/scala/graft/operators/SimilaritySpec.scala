package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").cache()
  }

  private def brute(query: Array[Float], k: Int, metric: Similarity.Metric): Seq[Long] = {
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def score(v: Array[Float]): Double = metric match {
      case Similarity.L2 => math.sqrt(v.zip(query).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d }.sum)
      case Similarity.InnerProduct => dot(v, query)
      case Similarity.Cosine =>
        dot(v, query) / (math.sqrt(dot(v, v)) * math.sqrt(dot(query, query)))
    }
    val ord = rows.map { case (id, v) => (id, score(v)) }
    val sorted = if (metric.descending)
      ord.sortBy { case (id, s) => (-s, id) }
    else ord.sortBy { case (id, s) => (s, id) }
    sorted.take(k).map(_._1).toSeq
  }

  private val query = {
    val rnd = new scala.util.Random(99)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }

  test("topK L2 matches brute force") {
    val got = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.L2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute(query, 10, Similarity.L2))
  }

  test("topK inner-product matches brute force") {
    val got = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.InnerProduct)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute(query, 10, Similarity.InnerProduct))
  }

  test("topK cosine matches brute force") {
    val got = Similarity.topK(corpus, "vec_id", "embedding", query, 10, Similarity.Cosine)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute(query, 10, Similarity.Cosine))
  }

  test("topK physical plan is TakeOrderedAndProject, not a global sort") {
    val plan = Similarity.topK(corpus, "vec_id", "embedding", query, 5, Similarity.L2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("topKBatchAgg (bounded-heap form) matches the window form") {
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    val q2 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val queries = Seq((0, query.toSeq), (1, q2.toSeq)).toDF("qid", "qvec")
    val win = Similarity.topKBatch(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", 5, Similarity.Cosine)
      .select("qid", "vec_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val agg = Similarity.topKBatchAgg(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", 5, Similarity.Cosine)
      .select("qid", "vec_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(agg == win)
  }

  test("topKBatch ranks per query and matches single-query topK") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val q2 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val queries = Seq((0, query.toSeq), (1, q2.toSeq)).toDF("qid", "qvec")
    val got = Similarity.topKBatch(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", 5, Similarity.Cosine)
      .collect().groupBy(_.getInt(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSeq }
    assert(got(0) == brute(query, 5, Similarity.Cosine))
    assert(got(1) == brute(q2, 5, Similarity.Cosine))
  }
}
