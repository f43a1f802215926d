package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions
import graft.operators.Similarity
import graft.vector.TextEmbedder

/** The generation seam — the reference's FLAN-T5 `text2text-generation`
  * step (reference ai_powered_financial_analysis.py:446-487) reduced to
  * its contract: overlap-ranked context sentences in, answer string out.
  * The zero-egress default composes extractively; a real generator (local
  * ONNX seq2seq, a serving endpoint) implements the same method and every
  * retrieval/grading path upstream is untouched.
  */
trait Synthesizer extends Serializable {
  /** `ranked`: candidate sentences best-first (already query-relevant). */
  def synthesize(query: String, ranked: Seq[String], maxSentences: Int): String
}

/** Deterministic extractive synthesis: greedy MMR-style pick over the
  * ranked candidates — a candidate that mostly repeats already-selected
  * sentences is skipped in favor of new information.
  */
object ExtractiveSynthesizer extends Synthesizer {
  private def terms(s: String): Set[String] =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").split("\\s+").filter(_.nonEmpty).toSet

  def synthesize(query: String, ranked: Seq[String], maxSentences: Int): String = {
    val picked = ranked.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.size >= maxSentences) acc
      else {
        val st = terms(s)
        val redundant = st.nonEmpty && acc.exists { p =>
          val pt = terms(p)
          st.intersect(pt).size.toDouble / st.size > 0.8
        }
        if (redundant) acc else acc :+ s
      }
    }
    if (picked.isEmpty) "No relevant context found." else picked.mkString(". ") + "."
  }
}

/** Retrieval + extractive answering (SURVEY.md §2.1 O31-O32, O35-O37, §3.3).
  *
  * The reference's RAG path is: embed query → FAISS top-k → 1000-char
  * context → FLAN-T5 generate (reference ai_powered_financial_analysis.py:
  * 446-487), entirely single-process driver code. Here retrieval is a Spark
  * job over the corpus DataFrame (distance expression + TakeOrderedAndProject)
  * and generation is replaced by a deterministic extractive answerer
  * (zero-egress: no LLM weights) — top-k docs, sentence-split, rank
  * sentences by query-term overlap. The interface stays pluggable so a real
  * generator can replace `answer`'s last step.
  */
final class QueryEngine(
    corpus: DataFrame,          // (id, text, embedding) — VectorStore layout
    featurizer: TextEmbedder,
    idCol: String = "doc_id",
    textCol: String = "text",
    vecCol: String = "embedding",
    memoSize: Int = 1000,
    synthesizer: Synthesizer = ExtractiveSynthesizer) extends Serializable {

  private val spark: SparkSession = corpus.sparkSession

  /** O35 — LRU query-embedding memo (the reference's `@lru_cache(1000)`,
    * py:677-679). Driver-side by nature: query strings arrive on the driver.
    */
  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, Array[Float]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Float]]): Boolean =
        size() > memoSize
    }

  def embed(query: String): Array[Float] = memo.synchronized {
    val cached = memo.get(query)
    if (cached != null) cached
    else {
      val v = featurizer.embedQuery(spark, query)
      memo.put(query, v)
      v
    }
  }

  /** O31/O32 — top-k retrieval: (id, text, score), best first. */
  def topK(query: String, k: Int = 7,
      metric: Similarity.Metric = Similarity.Cosine): DataFrame = {
    val qv = Similarity.vecLit(embed(query))
    val score = metric.expr(col(vecCol), qv).as("score")
    val ord =
      if (metric.descending) Seq(col("score").desc, col(idCol).asc)
      else Seq(col("score").asc, col(idCol).asc)
    corpus.select(col(idCol), col(textCol), score).orderBy(ord: _*).limit(k)
  }

  /** O36 replacement — extractive answer: rank sentences of the top-k docs
    * by distinct query-term overlap (ties: doc rank, sentence position),
    * then greedily select `maxSentences` with a redundancy penalty (MMR
    * style: a candidate that mostly repeats already-selected sentences is
    * skipped in favor of new information). Context per doc is clipped to
    * 1000 chars like the reference (py:459).
    */
  def answer(query: String, k: Int = 7, maxSentences: Int = 3): String = {
    val hits = topK(query, k)
      .withColumn("ctx", TextFunctions.sentences(substring(col(textCol), 1, 1000)))
    val qTerms = array_distinct(TextFunctions.tokens(
      graft.functions.CleanFunctions.cleanText(lit(query))))
    val ranked = hits
      .select(col(idCol), col("score"), posexplode(col("ctx")).as(Seq("pos", "sentence")))
      .withColumn("overlap",
        size(array_intersect(
          array_distinct(TextFunctions.tokens(
            graft.functions.CleanFunctions.cleanText(col("sentence")))),
          qTerms)))
      .filter(col("overlap") > 0)
      .orderBy(col("overlap").desc, col("score").desc, col(idCol).asc, col("pos").asc)
      .limit(maxSentences * 4) // shortlist for the diversity pass
    val cands = ranked.select("sentence").collect().map(_.getString(0)).toSeq
    synthesizer.synthesize(query, cands, maxSentences)
  }

  /** O37 — the reference's response-evaluation heuristics (py:579-594):
    * term-overlap accuracy, length-based clarity, grounding via context
    * containment. Plain driver-side functions over one answer.
    */
  def evaluate(query: String, ans: String, contexts: Seq[String]): Map[String, Double] = {
    def terms(s: String): Set[String] =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").split("\\s+").filter(_.nonEmpty).toSet
    val qt = terms(query); val at = terms(ans)
    val accuracy = if (qt.isEmpty) 0.0 else qt.intersect(at).size.toDouble / qt.size
    val words = at.size.toDouble
    val clarity = if (words >= 5 && words <= 120) 1.0 else if (words > 0) 0.5 else 0.0
    val ct = contexts.flatMap(terms).toSet
    val grounding = if (at.isEmpty) 0.0 else at.intersect(ct).size.toDouble / at.size
    Map("accuracy" -> accuracy, "clarity" -> clarity, "grounding" -> grounding)
  }
}
