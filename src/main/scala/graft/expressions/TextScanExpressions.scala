package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan kernels for the two regexes that dominated the
  * curation battery.
  *
  * Round-17 sf10 profile of `Curation.annotate` (500k docs, 32 cores):
  * the whole battery ran 32.5 s, of which `regexp_replace(lower(text),
  * "<.*?>|[^a-z0-9\\s]", "")` cost ~14.5 s and `regexp_count(text,
  * "[^a-zA-Z0-9 ]")` ~13.4 s — every other signal (two splits, stopword
  * filter, vocab, five language scores, md5 fingerprint, the quality
  * rational) combined under 3 s. Both patterns are character-class scans
  * with no backtracking value; java.util.regex still pays per-position
  * NFA dispatch on them. Each kernel below is the equivalent one-pass
  * byte scan over the UTF8String (no java String materialization, no
  * per-row Matcher), bit-equivalence with the regex form property-pinned
  * in TextScanExpressionsSpec.
  *
  * Regex semantics preserved exactly:
  *  - `<.*?>` (no DOTALL): `.` matches any code point EXCEPT the five
  *    line terminators \n, \r, U+0085, U+2028, U+2029 -- a '<' with no '>'
  *    before the next terminator/end fails the tag branch and falls to
  *    the char class (which removes the lone '<').
  *  - `\s` is ASCII-only ([ \t\n\x0B\f\r]) without UNICODE_CHARACTER_CLASS.
  *  - `regexp_count` counts code-point matches: a supplementary character
  *    is ONE match, which byte-wise is exactly the LEAD bytes (0xC0-0xFF);
  *    continuation bytes (0x80-0xBF) are not counted.
  *
  * These kernels are `CostlyTextKernel`s: Shuffle.hasCostlyRowWork keys
  * the width guards on them (replacing the regexes must not blind
  * widenPlan to the work).
  */
object TextScan {

  /** `regexp_replace(lowered, "<.*?>|[^a-z0-9\\s]", "")` as one byte scan.
    * Kept bytes are all ASCII, so the output is valid UTF-8 by
    * construction; multi-byte sequences are skipped byte-at-a-time (the
    * char class removes every non-[a-z0-9\s] code point whole).
    */
  def cleanScrub(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b == '<') {
        // lazy tag branch: nearest '>' with no line terminator in between
        var j = i + 1
        var found = false
        var failed = false
        while (j < n && !found && !failed) {
          val c = s.getByte(j) & 0xFF
          if (c == '>') found = true
          else if (c == '\n' || c == '\r') failed = true
          else if (c == 0xC2 && j + 1 < n && (s.getByte(j + 1) & 0xFF) == 0x85)
            failed = true // U+0085 NEL
          else if (c == 0xE2 && j + 2 < n && (s.getByte(j + 1) & 0xFF) == 0x80 &&
            ((s.getByte(j + 2) & 0xFF) == 0xA8 || (s.getByte(j + 2) & 0xFF) == 0xA9))
            failed = true // U+2028 LS / U+2029 PS
          else j += 1
        }
        if (found) i = j + 1 // whole <...> span removed
        else i += 1 // tag branch failed; '<' removed by the char class
      } else {
        // keep [a-z0-9] and ASCII \s = [ \t\n\x0B\f\r]; drop everything else
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
          b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') {
          out(o) = b.toByte
          o += 1
        }
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** `regexp_replace(s, "<[^>]+>|[^a-zA-Z0-9\\s]", "")` as one byte scan —
    * the reference's combined scrub (O13), which differs from
    * [[cleanScrub]] in three ways: the tag body is `[^>]+` (at least one
    * char, and a negated CLASS, so line terminators are allowed inside
    * the tag), `<>` therefore does NOT match the tag branch (both chars
    * fall to the char class), and uppercase letters are kept. '>' (0x3E)
    * never occurs as a UTF-8 continuation byte, so the byte scan for the
    * closing '>' is code-point-safe.
    */
  def scrubTags(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b == '<') {
        var j = i + 1
        while (j < n && (s.getByte(j) & 0xFF) != '>') j += 1
        if (j < n && j > i + 1) i = j + 1 // <[^>]+> span removed
        else i += 1 // no closer or empty body: '<' removed by the char class
      } else {
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') ||
          b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') {
          out(o) = b.toByte
          o += 1
        }
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** `regexp_count(s, "[^a-zA-Z0-9 ]")` as one byte scan: every ASCII
    * byte outside the class counts 1; every multi-byte code point (lead
    * byte 0xC0+) counts 1; continuation bytes count 0.
    */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var cnt = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b < 0x80) {
        if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == ' ')) cnt += 1
      } else if (b >= 0xC0) cnt += 1
      i += 1
    }
    cnt
  }
}

/** Marker: per-row text work expensive enough that the width guards
  * (Shuffle.hasCostlyRowWork / widenPlan) must treat it like the regex /
  * split / UDF families it replaces or complements.
  */
trait CostlyTextKernel extends Expression

case class CleanScrubExpr(child: Expression)
    extends UnaryExpression with CostlyTextKernel {
  override def prettyName: String = "clean_scrub"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def nullSafeEval(value: Any): Any =
    TextScan.cleanScrub(value.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.TextScan.cleanScrub($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ScrubTagsExpr(child: Expression)
    extends UnaryExpression with CostlyTextKernel {
  override def prettyName: String = "scrub_tags"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def nullSafeEval(value: Any): Any =
    TextScan.scrubTags(value.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.TextScan.scrubTags($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PunctCountExpr(child: Expression)
    extends UnaryExpression with CostlyTextKernel {
  override def prettyName: String = "punct_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def nullSafeEval(value: Any): Any =
    TextScan.punctCount(value.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.TextScan.punctCount($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface. */
object TextScanExpressions {
  def cleanScrub(c: Column): Column =
    GraftBridge.column(CleanScrubExpr(GraftBridge.expression(c)))
  def scrubTags(c: Column): Column =
    GraftBridge.column(ScrubTagsExpr(GraftBridge.expression(c)))
  def punctCount(c: Column): Column =
    GraftBridge.column(PunctCountExpr(GraftBridge.expression(c)))
}
