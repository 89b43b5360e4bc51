package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `w`-token window hashes of an `array<string>` token array, one
  * codegen'd pass — the window-fingerprint step of
  * [[graft.operators.Dedup.duplicatedSpans]].
  *
  * The composable form (`transform(sequence(...), i => xxhash64(
  * concat_ws(" ", slice(toks, i+1, w))))`) builds a w-token STRING per
  * window before hashing it: O(w·L) character copies and one garbage
  * string per window, and — being a higher-order lambda — it is
  * CodegenFallback, so the whole projection runs interpreted. This
  * expression hashes each token once (XXH64 over its UTF-8 bytes, the
  * same primitive Spark's `xxhash64` uses) and chains the w token hashes
  * per window in long arithmetic: no strings materialize at all.
  *
  * The hash VALUE intentionally differs from the composable form's —
  * duplicated-span outputs are hash-choice-invariant (the hash never
  * escapes the plan; any injective-in-practice window fingerprint yields
  * identical counts absent collisions), which is also why the md5-mirror
  * DuckDB oracle covers this path (`DedupSpec` proves native == md5
  * end-to-end on a planted corpus).
  *
  * Documents shorter than `w` yield an empty array by default;
  * `wholeTextIfShort = true` instead yields ONE hash over all tokens —
  * [[graft.functions.Text.shinglesFromTokens]]'s degenerate-shingle
  * convention, for the shingle-set consumers (jaccard index, minhash). */
case class TokenWindowHash64(child: Expression, w: Int,
                             wholeTextIfShort: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hash"

  override def nullSafeEval(input: Any): Any =
    TokenWindowHash64.compute(input.asInstanceOf[ArrayData], w, wholeTextIfShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenWindowHash64.compute($c, $w, $wholeTextIfShort)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHash64 =
    copy(child = newChild)
}

object TokenWindowHash64 {
  def compute(toks: ArrayData, w: Int, wholeTextIfShort: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < w && !wholeTextIfShort) return new GenericArrayData(Array.emptyLongArray)
    // hash every token once...
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    // ...then chain w token hashes per window (boundary-safe: the chain
    // folds ordered PAIRS, so "ab c" and "a bc" hash differently even
    // though their concatenations agree)
    val eff = math.min(w, n) // n < w only under wholeTextIfShort
    val out = new Array[Long](n - eff + 1)
    var p = 0
    while (p < out.length) {
      var h = 42L
      var j = p
      while (j < p + eff) { h = XXH64.hashLong(th(j), h); j += 1 }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  def tokenWindowHash(c: Column, w: Int, wholeTextIfShort: Boolean = false): Column =
    GraftSqlBridge.column(
      TokenWindowHash64(GraftSqlBridge.expression(c), w, wholeTextIfShort))
}
