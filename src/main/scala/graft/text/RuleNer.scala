package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Rule/gazetteer NER (SURVEY.md §2.1 O29).
  *
  * The reference runs Spark NLP's `recognize_entities_dl` pretrained
  * pipeline (reference ai_powered_financial_analysis.py:348-352); model
  * downloads are unavailable here, so the engine ships a deterministic
  * two-source recognizer with the same output shape — entity chunks
  * (text, type, begin, end) exploded per document:
  *  - gazetteer matches (exact token/phrase lookup, typed), and
  *  - pattern matches (capitalized-token runs → PER/ORG-ish MISC, $-amounts
  *    and percentages → MONEY/PERCENT).
  *
  * Implemented as a `flatMap` over a typed Dataset (SURVEY §7.3: simplest
  * correct form; a Catalyst Generator adds SQL-surface parity later if
  * needed). Executor-side, no driver state, linear scan — scale-safe.
  */
object RuleNer {

  final case class Entity(doc_id: Long, entity: String, entity_type: String, begin: Int, end: Int)

  /** Default gazetteer: public financial-domain names, mirroring the entity
    * types the reference's DL pipeline emits (PER/ORG/LOC/MISC — sample in
    * the reference notebook cell 30).
    */
  val defaultGazetteer: Map[String, String] = Map(
    "apple" -> "ORG", "amazon" -> "ORG", "microsoft" -> "ORG",
    "google" -> "ORG", "tesla" -> "ORG", "nvidia" -> "ORG",
    "reddit" -> "ORG", "cnbc" -> "ORG", "sec" -> "ORG",
    "nasdaq" -> "ORG", "nyse" -> "ORG",
    "america" -> "LOC", "china" -> "LOC", "europe" -> "LOC",
    "japan" -> "LOC", "india" -> "LOC",
    "trump" -> "PER", "musk" -> "PER", "powell" -> "PER"
  )

  /** Load a gazetteer from a TSV file — `token<TAB>TYPE` per line, `#`
    * comments and blanks skipped, tokens lowercased. The pretrained-NER
    * seam (reference uses `recognize_entities_dl`, py:348-352): a large
    * exported entity list drops in as data, no code change — same
    * activation pattern as the embedding weights (Embedders.default).
    */
  def loadGazetteer(path: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split('\t')
        require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
          s"RuleNer.loadGazetteer: malformed line '$l' in $path")
        parts(0).toLowerCase -> parts(1)
      }.toMap
  }

  val DefaultGazetteerPath = "models/gazetteer.tsv"

  /** The gazetteer in force: a local TSV at `GRAFT_NER_GAZETTEER` (or the
    * default path) wins; absent, the built-in financial-domain list.
    */
  def activeGazetteer: Map[String, String] = {
    val p = sys.env.getOrElse("GRAFT_NER_GAZETTEER", DefaultGazetteerPath)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(p))) loadGazetteer(p)
    else defaultGazetteer
  }

  private val moneyRe = """\$\d[\d,]*(\.\d+)?([mMbB]illion|[kKmMbB])?""".r
  private val pctRe = """\d+(\.\d+)?%""".r
  private val capRunRe = """\b[A-Z][a-z]+(\s+[A-Z][a-z]+)*\b""".r
  private val wordRe = """[A-Za-z]+""".r

  /** Extract entities from one document. Pure function — unit-testable and
    * executor-side only.
    */
  def extract(docId: Long, text: String, gazetteer: Map[String, String] = defaultGazetteer): Seq[Entity] = {
    if (text == null || text.isEmpty) return Seq.empty
    val gaz = wordRe.findAllMatchIn(text).flatMap { m =>
      gazetteer.get(m.matched.toLowerCase).map(t =>
        Entity(docId, m.matched, t, m.start, m.end))
    }.toSeq
    val money = moneyRe.findAllMatchIn(text).map(m =>
      Entity(docId, m.matched, "MONEY", m.start, m.end)).toSeq
    val pct = pctRe.findAllMatchIn(text).map(m =>
      Entity(docId, m.matched, "PERCENT", m.start, m.end)).toSeq
    val gazSpans = gaz.map(e => (e.begin, e.end))
    // Sentence-initial capitalization is sentence case, not an entity: when a
    // capitalized run starts a sentence, drop its first word and keep the rest
    // ("The Federal Reserve met" → "Federal Reserve").
    def sentenceInitial(pos: Int): Boolean =
      pos == 0 || text.take(pos).reverse.dropWhile(_.isWhitespace).headOption.exists("([.!?".contains(_))
    val caps = capRunRe.findAllMatchIn(text).flatMap { m =>
      val (start, matched) =
        if (sentenceInitial(m.start)) {
          val rest = m.matched.dropWhile(!_.isWhitespace).dropWhile(_.isWhitespace)
          (m.end - rest.length, rest)
        } else (m.start, m.matched)
      if (matched.nonEmpty && !gazSpans.exists(s => start < s._2 && s._1 < start + matched.length))
        Some(Entity(docId, matched, "MISC", start, start + matched.length))
      else None
    }.toSeq
    (gaz ++ money ++ pct ++ caps).sortBy(e => (e.begin, e.end, e.entity_type))
  }

  /** DataFrame surface: explode (doc_id, text) into entity rows. */
  def annotate(df: DataFrame, idCol: String, textCol: String,
      gazetteer: Map[String, String] = defaultGazetteer): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string")).as[(Long, String)]
    ds.flatMap { case (id, txt) => extract(id, txt, gazetteer) }.toDF()
  }
}
