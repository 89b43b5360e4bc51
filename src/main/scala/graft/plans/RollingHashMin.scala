package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint via a TRUE rolling hash: the
  * minimum of Rabin-Karp polynomial hashes over every `window`-byte
  * substring, computed in O(n) with the rolling update
  * `h' = (h - b_out·B^(w-1))·B + b_in` (mod 2^64, base 257).
  *
  * This is the DEFAULT behind [[graft.functions.Text.docFingerprint]]:
  * byte-level, allocation-free, ~two orders of magnitude cheaper per byte
  * than the md5-shingle oracle twin ([[graft.functions.Text
  * .docFingerprintMd5]]) — the fingerprint you'd actually run over 100 TB.
  * Same dedup property: identical documents agree always; near-identical
  * documents agree with probability ≈ overlap.
  */
case class RollingHashMin(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minHash(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.RollingHashMin.minHash($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHashMin {
  final val Base = 257L

  /** O(n) min-of-rolling-hashes over the UTF-8 bytes. Documents shorter
    * than the window hash as one full-length window. */
  def minHash(u: UTF8String, window: Int): Long = {
    val bytes = u.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) mod 2^64
    var pow = 1L
    var k = 1
    while (k < w) { pow *= Base; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * pow) * Base + (bytes(i) & 0xFF)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def rollingHashMin(c: Column, window: Int): Column =
    GraftSqlBridge.column(RollingHashMin(GraftSqlBridge.expression(c), window))
}
