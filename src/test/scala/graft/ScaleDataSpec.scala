package graft

import org.apache.spark.sql.functions._

class ScaleDataSpec extends SparkSpec {

  test("cipher is a bijection on words: within-replica structure preserved") {
    val words = Seq("batch", "spark", "column", "zebra", "aa11bb", "x")
    for (r <- Seq(1, 5, 27, 53, 99)) {
      val mapped = words.map(ScaleData.cipher(_, r))
      // distinct words stay distinct (injective), lengths survive
      assert(mapped.distinct.size == words.size, s"r=$r collapsed words")
      assert(mapped.map(_.length) == words.map(_.length))
      // equal words map equally — duplicate structure is exact
      assert(ScaleData.cipher("batch batch zebra", r)
        .split(' ').toSeq.distinct.size == 2)
    }
  }

  test("replica 0 is the identity; replicas differ from it and each other") {
    val t = "the quick brown fox jumps over lazy dog"
    assert(ScaleData.cipher(t, 0) == t)
    // the affine (a,b) construction must stay distinct past the Caesar
    // period of 26 — r and r+26 were identical under the old scheme
    val variants = (0 until 104).map(ScaleData.cipher(t, _))
    assert(variants.distinct.size == variants.size,
      "two replicas share a cipher — cross-replica duplicates return")
  }

  test("stopwords and lang markers survive, even with adjacent punctuation") {
    import graft.functions.{TextFunctions => TF}
    val stop = TF.stopwords.head
    val marker = TF.langMarkers.head._2.head
    for (r <- Seq(1, 30, 77)) {
      assert(ScaleData.cipher(s"$stop remains", r).startsWith(stop))
      assert(ScaleData.cipher(s"$marker, stays", r).startsWith(s"$marker,"))
      assert(ScaleData.cipher(s"($stop)", r) == s"($stop)")
    }
  }

  test("punctuation and digits pass through unchanged") {
    for (r <- Seq(1, 40)) {
      val out = ScaleData.cipher("price: $1,200 up 7%", r)
      assert(out.contains("$1,200") && out.contains("7%"), out)
    }
  }

  test("scaled documents: exact N-x rows, ids unique, within-replica dups preserved") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s", 16),
      (1L, "alpha beta gamma", "en", "s", 16), // exact dup of doc 0
      (2L, "delta epsilon zeta", "en", "s", 18)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ScaleData.scaleDocuments(docs, 4).cache()
    assert(out.count() == 12)
    assert(out.select("doc_id").distinct().count() == 12)
    // each replica still contains exactly one duplicated text pair, and
    // texts never collide across replicas
    val groups = out.groupBy("text").count().select("count")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(groups == Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L), groups)
    out.unpersist()
  }

  test("scaled embeddings: shift+flip preserves norms and within-replica dots") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i + 1).toFloat), 0),
      (1L, Array.tabulate(64)(i => math.cos(2 * i + 1).toFloat), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = ScaleData.scaleEmbeddings(vecs, 80).cache()
    assert(out.count() == 160)
    val byReplica = out.collect().map { r =>
      (r.getLong(0) / 2, r.getLong(0) % 2, r.getSeq[Float](1).toArray)
    }.groupBy(_._1)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val origDot = {
      val m = byReplica(0L).map(t => t._2 -> t._3).toMap
      dot(m(0L), m(1L))
    }
    val r0map = byReplica(0L).map(t => t._2 -> t._3).toMap
    val origNorm = dot(r0map(0L), r0map(0L))
    byReplica.foreach { case (r, rows) =>
      val m = rows.map(t => t._2 -> t._3).toMap
      // orthogonal transform: norms and pairwise dot products are
      // preserved up to float rounding
      assert(math.abs(dot(m(0L), m(1L)) - origDot) < 1e-4, s"replica $r cross-dot")
      assert(math.abs(dot(m(0L), m(0L)) - origNorm) < 1e-4, s"replica $r norm")
    }
    // replica 64+ composes the sign flip — vectors must still differ from
    // replica (r - 64)'s plain shift
    val r64 = byReplica(64L).map(t => t._2 -> t._3).toMap
    val r0 = byReplica(0L).map(t => t._2 -> t._3).toMap
    assert(!r64(0L).sameElements(r0(0L)))
    out.unpersist()
  }

  test("wide embedding replication: distinct past 2*dim, orthogonal, block-0 bit-compat") {
    import spark.implicits._
    // dim=64 → the shift/flip family has 128 members; 200 replicas used
    // to silently twin (replica r vs r-128 shared a transform). The wide
    // path must keep ALL replicas' transforms distinct.
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i + 1).toFloat), 0),
      (1L, Array.tabulate(64)(i => math.cos(2 * i + 1).toFloat), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = ScaleData.scaleEmbeddings(vecs, 200).cache()
    assert(out.count() == 400)
    val byReplica = out.collect().map { r =>
      (r.getLong(0) / 2, r.getLong(0) % 2, r.getSeq[Float](1).toArray)
    }.groupBy(_._1)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val r0map = byReplica(0L).map(t => t._2 -> t._3).toMap
    val origDot = dot(r0map(0L), r0map(1L))
    val origNorm = dot(r0map(0L), r0map(0L))
    // orthogonality across ALL 200 replicas (permutations preserve dots)
    byReplica.foreach { case (r, rows) =>
      val m = rows.map(t => t._2 -> t._3).toMap
      assert(math.abs(dot(m(0L), m(1L)) - origDot) < 1e-4, s"replica $r cross-dot")
      assert(math.abs(dot(m(0L), m(0L)) - origNorm) < 1e-4, s"replica $r norm")
    }
    // the old construction's failure case: replica 128 twinned replica 64,
    // replica 199 twinned replica 71. Distinctness must now hold for every
    // replica pair (probe vector 0's image is a transform fingerprint).
    val images = byReplica.toSeq.map { case (r, rows) =>
      r -> rows.find(_._2 == 0L).get._3.toSeq
    }.toMap
    assert(images.values.toSet.size == 200,
      s"only ${images.values.toSet.size} distinct transforms for 200 replicas")
    assert(images(128L) != images(64L) && images(199L) != images(71L))
    // block 0 (replicas < 128) must be bit-identical to the column path
    val narrow = ScaleData.scaleEmbeddings(vecs, 100).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    (0L until 200L by 37L).filter(_ < 100L).foreach { id =>
      assert(narrow(id) == out.collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap.apply(id), s"id $id")
    }
    out.unpersist()
  }
}
