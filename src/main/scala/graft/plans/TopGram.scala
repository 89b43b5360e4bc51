package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Most-frequent element of an `array<string>` in ONE pass, ties broken by
  * the lexicographically (binary) smallest element — the same total order
  * as Spark's `min_by(g, struct(-c, g))` and DuckDB's
  * `ORDER BY c DESC, g ASC`, so results stay oracle-portable.
  *
  * Returns `struct<gram string, cnt bigint>`. This is the per-document
  * argmax the Gopher repetition metrics need
  * ([[graft.operators.Repetition]]): computing it in-row removes the
  * corpus-wide `(doc, n, gram)` explode + hash-agg that made the metric
  * shuffle every n-gram occurrence of the corpus (measured 60× cost at 10×
  * data in the round-3 sf1 bench) — per-document statistics should never
  * leave the row.
  */
case class TopGram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = true),
    StructField("cnt", LongType, nullable = true)))
  override def prettyName: String = "top_gram"

  override def nullSafeEval(input: Any): Any =
    TopGram.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TopGram.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopGram =
    copy(child = newChild)
}

object TopGram {
  /** One hash-count pass + one scan of the (distinct-gram-sized) count map.
    * Null elements are skipped; an empty/all-null array yields (null, null). */
  def compute(grams: ArrayData): InternalRow = {
    val n = grams.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]](math.max(8, n))
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val g = grams.getUTF8String(i)
        val slot = counts.get(g)
        if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    var bestG: UTF8String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey
        bestC = c
      }
    }
    if (bestG == null) new GenericInternalRow(Array[Any](null, null))
    // clone: the map keys may point into a reused UnsafeRow buffer
    else new GenericInternalRow(Array[Any](bestG.clone(), bestC))
  }

  def topGram(c: Column): Column =
    GraftSqlBridge.column(TopGram(GraftSqlBridge.expression(c)))
}
