package graft.plans

import graft.functions.NormalizeImpl
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native query-normalization expression: one scan per row instead of the
  * three regex passes of the composable chain (the chain remains the spec
  * and the DuckDB-oracle form; `NormalizeNativeSpec` property-tests exact
  * equivalence). Codegen emits a static call, so the expression stays
  * inside whole-stage codegen without inlining the scanner. */
case class NormalizeQueryExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_query"

  override def nullSafeEval(input: Any): Any =
    NormalizeImpl.normalizeUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeImpl.normalizeUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeQueryExpr =
    copy(child = newChild)
}

object NormalizeQueryExpr {
  def normalizeQueryNative(c: Column): Column =
    GraftSqlBridge.column(NormalizeQueryExpr(GraftSqlBridge.expression(c)))
}
