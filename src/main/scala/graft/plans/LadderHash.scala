package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native window-hash kernels for the maximal-span LADDER
  * ([[graft.operators.Dedup.maximalDuplicatedSpans]]) — the same
  * optimization-guide step 4 swap [[TokenWindowHash64]] made for the
  * fixed-w span operators, extended to the ladder's two variable shapes:
  *
  *  - [[PosWindowHash]]: window hashes at REQUESTED positions, one probe
  *    length — the ladder rounds, where only the previous round's
  *    survivors re-test. Replaces an interpreted
  *    `transform(filter(ps, rem ≥ len), p → xxhash64(concat_ws(" ",
  *    slice(toks, p+1, len))))` that built a len-token string per
  *    candidate.
  *  - [[LadderWindowHash]]: for each seed (pos, lo), window hashes at
  *    EVERY length in [minLen, min(2·lo, rem+1)) — the resolve stage.
  *    The chained-fold hash is INCREMENTAL in window length
  *    (h(pos, p+1) = chain(h(pos, p), tokenHash(pos+p))), so all of a
  *    seed's lengths cost one O(hi) chain instead of the composable
  *    form's O(hi²) independent re-hashes — the resolve was the
  *    operator's two most expensive stages in the r18 profile (19.3 s +
  *    9.8 s task time at sf0.1).
  *
  * Hash algebra is EXACTLY [[TokenWindowHash64]]'s: XXH64(seed 42) over
  * each token's UTF-8 bytes once, then a length-long chain of
  * `XXH64.hashLong` folds from seed 42. The VALUE differs from the
  * replaced `xxhash64(concat_ws(" ", …))` form — which is free here for
  * the same reason the class doc of maximalDuplicatedSpans already
  * states for its own hash: gram identity only ever feeds same-length
  * equality counts inside the plan (the hash never escapes), the DuckDB
  * oracle is an INDEPENDENT suffix-sort algorithm, and equal-gram
  * semantics assume no 64-bit collisions either way. DedupSpec's
  * suffix-sort cross-check and the q_span_maximal / q_span_scrub_maximal
  * oracles pin the outputs unchanged.
  *
  * Null algebra: token arrays come from `Text.tokens` over non-null text
  * and positions from prior rounds' collect_lists, so nulls are
  * impossible by construction; both expressions still inherit
  * BinaryExpression's null-in-null-out via nullSafeEval. */
object LadderHash {

  @inline private def tokenHashes(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    th
  }

  /** (pos, g) structs for each requested position whose window of `len`
    * tokens fits (rem = n − pos ≥ len); order follows `ps`. */
  def posWindows(toks: ArrayData, ps: ArrayData, len: Int): ArrayData = {
    val th = tokenHashes(toks)
    val n = th.length
    val m = ps.numElements()
    val rows = new scala.collection.mutable.ArrayBuffer[InternalRow](m)
    var i = 0
    while (i < m) {
      val p = ps.getInt(i)
      if (n - p >= len) {
        var h = 42L
        var j = p
        val end = p + len
        while (j < end) { h = XXH64.hashLong(th(j), h); j += 1 }
        rows += InternalRow(p, h)
      }
      i += 1
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** (pos, p, g) structs for each seed struct (pos, lo) in `qs` and each
    * probe length p in [minLen, min(2·lo, n − pos + 1) − 1], hashes
    * chained incrementally across p. Mirrors the composable
    * `transform(sequence(minLen, least(lo·2, size − pos + 1) − 1), …)`
    * bounds exactly (seeds always satisfy n − pos ≥ minLen, so the
    * sequence is never descending). */
  def ladderWindows(toks: ArrayData, qs: ArrayData, minLen: Int): ArrayData = {
    val th = tokenHashes(toks)
    val n = th.length
    val m = qs.numElements()
    val rows = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var i = 0
    while (i < m) {
      val q = qs.getStruct(i, 2)
      val pos = q.getInt(0)
      val lo = q.getInt(1)
      val hi = math.min(2L * lo, n - pos + 1L).toInt - 1 // inclusive upper p
      var h = 42L
      var j = pos
      // chain the first minLen−1 tokens, then emit one row per length
      val firstEnd = pos + minLen - 1
      while (j < firstEnd && j < n) { h = XXH64.hashLong(th(j), h); j += 1 }
      var p = minLen
      while (p <= hi) {
        h = XXH64.hashLong(th(pos + p - 1), h)
        rows += InternalRow(pos, p, h)
        p += 1
      }
      i += 1
    }
    new GenericArrayData(rows.toArray[Any])
  }
}

/** See [[LadderHash.posWindows]]. */
case class PosWindowHash(left: Expression, right: Expression, len: Int)
    extends BinaryExpression {
  require(len >= 1, s"len must be >= 1, got $len")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "pos_window_hash"

  override def nullSafeEval(toks: Any, ps: Any): Any =
    LadderHash.posWindows(toks.asInstanceOf[ArrayData],
      ps.asInstanceOf[ArrayData], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.plans.LadderHash.posWindows($t, $p, $len);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PosWindowHash =
    copy(left = newLeft, right = newRight)
}

object PosWindowHash {
  def at(toks: Column, ps: Column, len: Int): Column =
    GraftSqlBridge.column(PosWindowHash(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(ps), len))
}

/** See [[LadderHash.ladderWindows]]. */
case class LadderWindowHash(left: Expression, right: Expression, minLen: Int)
    extends BinaryExpression {
  require(minLen >= 2, s"minLen must be >= 2, got $minLen")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("p", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ladder_window_hash"

  override def nullSafeEval(toks: Any, qs: Any): Any =
    LadderHash.ladderWindows(toks.asInstanceOf[ArrayData],
      qs.asInstanceOf[ArrayData], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, q) =>
      s"${ev.value} = graft.plans.LadderHash.ladderWindows($t, $q, $minLen);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LadderWindowHash =
    copy(left = newLeft, right = newRight)
}

object LadderWindowHash {
  def at(toks: Column, qs: Column, minLen: Int): Column =
    GraftSqlBridge.column(LadderWindowHash(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(qs), minLen))
}
