package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Feature-hashed bag of words over an `array<string>` token array, one
  * pass — the native form of [[graft.operators.Vectors.hashedBow]]'s
  * per-row math.
  *
  * Bit-identical to the composable Column form (kept as the spec twin)
  * and to the DuckDB oracle: bucket = first 8 md5 hex chars as an
  * unsigned int mod `dim` (computed here directly from the first 4
  * digest bytes), sign = parity of the 9th hex char (high nibble of
  * digest byte 4). The composable form is a `transform` × `aggregate`
  * nest — O(dim·L) INTERPRETED CaseWhen steps per document (higher-order
  * lambdas are CodegenFallback), which benched 22 s at sf0.1; this is
  * one md5 and one array write per token. */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_bow"

  override def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashedBow.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
}

object HashedBow {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(toks: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    val digest = md.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(toks.getUTF8String(i).getBytes)
      // first 8 hex chars as an unsigned 32-bit value == big-endian first
      // 4 digest bytes (what conv(substring(md5(t),1,8),16,10) parses)
      val bucket = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % dim
      // 9th hex char = high nibble of byte 4
      val sign = if ((((d(4) >> 4) & 0xf) % 2) == 0) 1L else -1L
      out(bucket.toInt) += sign
      i += 1
    }
    new GenericArrayData(out)
  }

  def hashedBow(c: Column, dim: Int): Column =
    GraftSqlBridge.column(HashedBow(GraftSqlBridge.expression(c), dim))
}
