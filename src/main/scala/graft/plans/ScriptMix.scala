package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-script composition of a string in ONE codepoint pass —
  * `struct<latin, cjk, cyrillic, greek, arabic, hangul, digit, space,
  * other>` counts — the mixed-script signal web-curation pipelines use to
  * catch script-confusion spam, mis-tagged languages and mojibake before
  * language-ID proper (which [[graft.functions.Text.langId]] handles at
  * the lexicon level).
  *
  * The script classes are EXPLICIT BMP codepoint ranges (documented
  * below), not `\p{Script=…}` properties, so any engine reproduces them
  * from the same table — the DuckDB oracle counts the identical ranges
  * with RE2 character classes. Counts are exact integers; the only
  * derived doubles are per-class fractions computed OUTSIDE the
  * expression with a zero-length guard. Ranges:
  *  - latin: 0041–005A, 0061–007A, 00C0–024F
  *  - cjk: 3040–30FF (kana), 3400–4DBF (ext A), 4E00–9FFF (unified)
  *  - cyrillic: 0400–04FF; greek: 0370–03FF; arabic: 0600–06FF
  *  - hangul: 1100–11FF, AC00–D7AF
  *  - digit: 0030–0039; space: Java `Character.isWhitespace`
  *    ∩ BMP ASCII/typographic spaces (0009–000D, 0020, 00A0, 2000–200A,
  *    2028, 2029, 202F, 205F, 3000) — an explicit list, not the Java
  *    predicate, for engine portability
  *  - other: everything else (punctuation, symbols, unlisted scripts)
  */
case class ScriptMix(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    ScriptMix.Fields.map(f => StructField(f, LongType, nullable = true)))
  override def prettyName: String = "script_mix"

  override def nullSafeEval(input: Any): Any =
    ScriptMix.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ScriptMix.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptMix =
    copy(child = newChild)
}

object ScriptMix {
  val Fields: Seq[String] = Seq("latin", "cjk", "cyrillic", "greek",
    "arabic", "hangul", "digit", "space", "other")

  private def isSpace(cp: Int): Boolean =
    (cp >= 0x0009 && cp <= 0x000D) || cp == 0x0020 || cp == 0x00A0 ||
      (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 || cp == 0x2029 ||
      cp == 0x202F || cp == 0x205F || cp == 0x3000

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var latin, cjk, cyr, greek, arabic, hangul, digit, space, other = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0x00C0 && cp <= 0x024F)) latin += 1
      else if ((cp >= 0x3040 && cp <= 0x30FF) ||
        (cp >= 0x3400 && cp <= 0x4DBF) ||
        (cp >= 0x4E00 && cp <= 0x9FFF)) cjk += 1
      else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      else if (cp >= 0x0370 && cp <= 0x03FF) greek += 1
      else if (cp >= 0x0600 && cp <= 0x06FF) arabic += 1
      else if ((cp >= 0x1100 && cp <= 0x11FF) ||
        (cp >= 0xAC00 && cp <= 0xD7AF)) hangul += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (isSpace(cp)) space += 1
      else other += 1
    }
    new GenericInternalRow(Array[Any](latin, cjk, cyr, greek, arabic,
      hangul, digit, space, other))
  }

  def scriptMix(c: Column): Column =
    GraftSqlBridge.column(ScriptMix(GraftSqlBridge.expression(c)))
}
