package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for the dedup operators' reassembly
  * projections — optimization-guide step 4 applied to the one
  * interpreted hot loop left in the scrub family (r19, verdict ask #4).
  *
  * The composable form every reassembly site shared,
  * {{{
  *   when(rem.isNull, array_join(toks, sep))
  *     .otherwise(array_join(filter(toks, (_, i) => !array_contains(rem, i)), sep))
  * }}}
  * evaluates the `filter` lambda INTERPRETED, and the `array_contains`
  * probe inside it scans `rem` per ELEMENT — O(len × |removed|) per
  * doc, the exact pattern the r18 PqKernels pass eliminated from the
  * ANN loops. Fine on the fixture; hostile at 100 TB docs with many
  * removed spans. [[JoinTokensExcept]] runs one O(len + |removed|)
  * pass: mark removed positions in a bitmap sized to the element
  * count, then emit the kept elements through the same
  * separator-joining routine `array_join` uses (`UTF8String.concatWs`
  * — null elements skipped, no separator). Call sites:
  * `Dedup.removeDuplicatedSpans` / `removeMaximalSpans` (sep " ") and
  * `Dedup.removeBoilerplateLines` / `dedupParagraphs` (sep "\n").
  *
  * BIT-IDENTICAL by construction, replicating the composable chain's
  * full null algebra (spec'd in SpanScrubSpec against the verbatim
  * original expression; the untouched DuckDB oracles of every scrub
  * query pin the composition cross-engine):
  *  - `toks` NULL → NULL (both `array_join(null)` branches);
  *  - `rem` NULL → join ALL elements (the `when` branch);
  *  - a NULL element in `rem` (impossible from the dedup pipelines,
  *    whose positions come from `sequence`/`posexplode`, but part of
  *    the expression's algebra): `array_contains` returns null for
  *    every index not present and true for every index present, so
  *    `!pred` is never true and `filter` drops EVERY element → empty
  *    string;
  *  - positions outside [0, |toks|) never match an index — ignored;
  *  - NULL elements at kept positions are skipped by the join with no
  *    separator, exactly as `array_join` does. */
object SpanScrub {

  /** One-pass join-except-positions; see object scaladoc for the exact
    * semantics table. */
  def joinExcept(toks: ArrayData, rem: ArrayData, sep: UTF8String): UTF8String = {
    val n = toks.numElements()
    var removed: Array[Boolean] = null
    if (rem != null) {
      removed = new Array[Boolean](n)
      val m = rem.numElements()
      var j = 0
      while (j < m) {
        // a null element poisons array_contains for non-members: the
        // original filter keeps nothing (object scaladoc)
        if (rem.isNullAt(j)) return UTF8String.EMPTY_UTF8
        val v = rem.getInt(j)
        if (v >= 0 && v < n) removed(v) = true
        j += 1
      }
    }
    val kept = new Array[UTF8String](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (removed == null || !removed(i)) {
        // concatWs skips nulls exactly as array_join does
        kept(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    UTF8String.concatWs(sep, java.util.Arrays.copyOf(kept, k): _*)
  }
}

/** `array_join(filter(toks, (_, i) => !array_contains(rem, i)), sep)`
  * with the rem-NULL case folded in (join everything) — see
  * [[SpanScrub]] for the parity contract. NULL only when `toks` is
  * NULL. `sep` is a construction-time literal (the call sites use a
  * constant separator), kept out of the child list like the PqKernels
  * codebook literals. */
case class JoinTokensExcept(left: Expression, right: Expression,
                            sep: String)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "join_tokens_except"
  // rem-NULL is a VALID input (join all tokens), so nullability follows
  // the token array alone and evaluation must not null-short-circuit
  // on the right child
  override def nullable: Boolean = left.nullable

  @transient private lazy val sepU: UTF8String = UTF8String.fromString(sep)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else {
      val r = right.eval(input)
      SpanScrub.joinExcept(t.asInstanceOf[ArrayData],
        if (r == null) null else r.asInstanceOf[ArrayData], sepU)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU,
      "org.apache.spark.unsafe.types.UTF8String")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
            |${l.code}
            |${r.code}
            |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
            |  ${l.isNull} ? null : graft.plans.SpanScrub.joinExcept(
            |    ${l.value}, ${r.isNull} ? null : ${r.value}, $sepRef);
            |""".stripMargin,
      isNull = l.isNull)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JoinTokensExcept =
    copy(left = newLeft, right = newRight)
}

object JoinTokensExcept {
  def joinExcept(toks: Column, removedPositions: Column,
                 sep: String = " "): Column =
    GraftSqlBridge.column(JoinTokensExcept(
      GraftSqlBridge.expression(toks),
      GraftSqlBridge.expression(removedPositions), sep))
}
