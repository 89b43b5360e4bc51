package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W4/W5: pagination and top-k (SURVEY.md §2.6).
  *
  * The reference pages driver-side over Python lists (`querysight.py:77-84`).
  * Distributed pagination needs a total order: callers must include a unique
  * tie-break column, otherwise page boundaries are nondeterministic.
  * Top-k goes through `orderBy().limit(k)` which Spark executes as
  * TakeOrderedAndProject — per-partition heaps + tiny driver merge, no
  * global sort at scale.
  */
object Paging {

  /** 1-based page of `pageSize` rows under the given total order. */
  def page(df: DataFrame, order: Seq[Column], pageSize: Int, pageNum: Int): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") > (pageNum - 1) * pageSize.toLong &&
        col("row_num") <= pageNum.toLong * pageSize)
  }

  /** Global top-k (TakeOrderedAndProject — scales without a full sort). */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k via ranked window (the shape a grouped leaderboard
    * needs; shuffles once on the partition key). */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= k)
  }
}
