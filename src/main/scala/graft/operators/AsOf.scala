package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * `rightTs <= leftTs` in the same key group (the canonical time-series
  * enrichment operator; Spark has no builtin).
  *
  * Implemented by COMPOSITION (preference order (a) of the build rules),
  * not a custom SparkPlan: both sides are tagged and unioned, then one
  * window pass per key carries the latest right payload forward
  * (`last(..., ignoreNulls)` over rows-unbounded-preceding). Cost: one
  * shuffle of |L|+|R| rows on the key — the same lower bound a dedicated
  * sort-merge as-of implementation would pay — and the sort within
  * partitions is exactly the window sort. Ties on the timestamp order
  * right-before-left, so an exactly-simultaneous right row matches
  * (`<=` semantics).
  *
  * Caller contract: (key, ts) must be unique on the right side (pre-
  * aggregate duplicates first) or the tie winner among equal right rows
  * is unspecified.
  */
object AsOf {

  /** @param rightPayload right-side columns to attach (prefixed). */
  def joinBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = struct(rightPayload.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema.head.dataType

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lrow"),
        lit(null).cast(payType).as("_rpay")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
        payStruct.as("_rpay")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      rightPayload.map(c => col(s"_match.$c").as(s"$prefix$c"))
    matched.select(out: _*)
  }
}
