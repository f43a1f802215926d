package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Graded evaluation of RuleNer on a HELD-OUT labeled fixture — sentences
  * whose named entities are deliberately absent from the default gazetteer,
  * so every hit comes from the pattern rules (capitalized-run, money,
  * percent), not from lookup. Mirrors the reference's manual accuracy
  * evaluation of its pretrained `recognize_entities_dl` pipeline (~91%,
  * reference README.md:41) with a reproducible pinned floor instead of a
  * one-off manual count.
  *
  * Scoring is entity-text match per sentence (the granularity the
  * reference's manual eval used): a predicted entity string that equals a
  * gold entity string is a true positive; gold MONEY/PERCENT must also
  * carry the right type. Detection floors are pinned a few points under
  * the measured values so a rule regression fails loudly while wording
  * tweaks to the fixture don't.
  */
class RuleNerEvalSpec extends AnyFunSuite {

  // (sentence, gold entities as (text, type)). Public-knowledge financial
  // news shapes; none of the named entities appear in
  // RuleNer.defaultGazetteer, so this is a held-out domain for the rules.
  // The fixture intentionally includes the rule system's known hard cases:
  // sentence-initial entities (sentence-case ambiguity) and capitalized
  // non-entities (month names) — an honest floor, not a softball one.
  private val gold: Seq[(String, Set[(String, String)])] = Seq(
    ("Shares of Boeing fell 4.2% after the delivery report.",
      Set("Boeing" -> "ORG", "4.2%" -> "PERCENT")),
    ("Analysts at Goldman Sachs raised their target to $250.",
      Set("Goldman Sachs" -> "ORG", "$250" -> "MONEY")),
    ("The chancellor of Germany met investors in Frankfurt.",
      Set("Germany" -> "LOC", "Frankfurt" -> "LOC")),
    ("Quarterly revenue at Intel grew 8% to $12.7billion.",
      Set("Intel" -> "ORG", "8%" -> "PERCENT", "$12.7billion" -> "MONEY")),
    ("A fund run by Warren Buffett disclosed a new stake.",
      Set("Warren Buffett" -> "PER")),
    ("Regulators in Brazil approved the merger on Tuesday.",
      Set("Brazil" -> "LOC")),
    ("The central bank of Canada held rates at 5%.",
      Set("Canada" -> "LOC", "5%" -> "PERCENT")),
    ("Treasury secretary Janet Yellen spoke about inflation.",
      Set("Janet Yellen" -> "PER")),
    ("Oil major Shell reported earnings of $6.2billion.",
      Set("Shell" -> "ORG", "$6.2billion" -> "MONEY")),
    ("Deliveries from the Hamburg plant rose 12.5% last quarter.",
      Set("Hamburg" -> "LOC", "12.5%" -> "PERCENT")),
    ("Executives at Morgan Stanley expect volatility to persist.",
      Set("Morgan Stanley" -> "ORG")),
    ("The startup was valued at $900million by investors.",
      Set("$900million" -> "MONEY")),
    ("Chipmaker Broadcom guided 3% above consensus.",
      Set("Broadcom" -> "ORG", "3%" -> "PERCENT")),
    ("Exports from Vietnam to Mexico doubled this year.",
      Set("Vietnam" -> "LOC", "Mexico" -> "LOC")),
    ("Fund manager Cathie Wood added to her position.",
      Set("Cathie Wood" -> "PER")),
    // sentence-initial entity: sentence-case handling drops the first
    // capitalized word, so single-word leading entities are known misses
    ("Siemens won a rail contract worth $3billion.",
      Set("Siemens" -> "ORG", "$3billion" -> "MONEY")),
    ("The bank cut its forecast for growth to 1.8% in France.",
      Set("1.8%" -> "PERCENT", "France" -> "LOC")),
    ("Investor Ray Dalio warned about debt cycles.",
      Set("Ray Dalio" -> "PER")),
    ("Mining giant Glencore paid a dividend of $0.13 per share.",
      Set("Glencore" -> "ORG", "$0.13" -> "MONEY")),
    ("Sales in Spain and Portugal fell 2% in March.",
      Set("Spain" -> "LOC", "Portugal" -> "LOC", "2%" -> "PERCENT"))
  )

  private def heldOut(): Unit = {
    val gazKeys = RuleNer.defaultGazetteer.keySet
    val leaked = for {
      (_, ents) <- gold
      (e, t) <- ents
      if t != "MONEY" && t != "PERCENT"
      w <- e.split("\\s+")
      if gazKeys.contains(w.toLowerCase)
    } yield e
    assert(leaked.isEmpty, s"fixture entities present in gazetteer: $leaked")
  }

  private case class Scores(precision: Double, recall: Double,
      typedOk: Int, typedTotal: Int)

  private def score(): Scores = {
    var tp = 0; var fp = 0; var fn = 0
    var typedOk = 0; var typedTotal = 0
    gold.zipWithIndex.foreach { case ((sentence, ents), i) =>
      val pred = RuleNer.extract(i.toLong, sentence)
      val predTexts = pred.map(_.entity).toSet
      val goldTexts = ents.map(_._1)
      tp += predTexts.intersect(goldTexts).size
      fp += predTexts.diff(goldTexts).size
      fn += goldTexts.diff(predTexts).size
      // MONEY/PERCENT carry exact types; named entities may legitimately
      // surface as MISC from the pattern rules (no lookup available), so
      // type accuracy is graded only where the rules CLAIM a type
      ents.foreach { case (text, tpe) =>
        if (tpe == "MONEY" || tpe == "PERCENT") {
          typedTotal += 1
          if (pred.exists(e => e.entity == text && e.entity_type == tpe)) typedOk += 1
        }
      }
    }
    Scores(tp.toDouble / (tp + fp), tp.toDouble / (tp + fn), typedOk, typedTotal)
  }

  test("fixture is genuinely held out from the gazetteer") { heldOut() }

  test("held-out detection precision/recall beat the pinned floors") {
    val s = score()
    info(f"held-out NER: precision=${s.precision}%.3f recall=${s.recall}%.3f " +
      f"typed=${s.typedOk}/${s.typedTotal}")
    // measured 0.944 / 0.971 — at or above the reference pipeline's ~91%
    // manual accuracy; floors pinned a few points under so rule
    // regressions fail while fixture wording tweaks don't
    assert(s.precision >= 0.85, f"precision ${s.precision}%.3f under floor 0.85")
    assert(s.recall >= 0.90, f"recall ${s.recall}%.3f under floor 0.90")
  }

  test("MONEY and PERCENT types are exact on the held-out set") {
    val s = score()
    assert(s.typedOk == s.typedTotal,
      s"typed MONEY/PERCENT hits ${s.typedOk}/${s.typedTotal}")
  }
}
