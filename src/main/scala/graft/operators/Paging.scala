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

  /** 1-based page of `pageSize` rows under the given total order.
    *
    * SCALE WARNING: the un-partitioned window collapses the whole input
    * into one task — it is the only honest OFFSET semantics, but deep
    * pagination over a large table should use [[after]] (keyset/seek
    * pagination), which never materializes a global row number. */
  def page(df: DataFrame, order: Seq[Column], pageSize: Int, pageNum: Int): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") > (pageNum - 1) * pageSize.toLong &&
        col("row_num") <= pageNum.toLong * pageSize)
  }

  /** One sort key: (column, last-seen value, descending?). */
  final case class Keyset(key: Column, last: Column, desc: Boolean = false)

  /** Lexicographic strictly-after predicate for a keyset:
    * `(k1,k2,...) > (v1,v2,...)` under each key's direction. */
  def afterPredicate(keys: Seq[Keyset]): Column =
    keys.zipWithIndex.map { case (k, i) =>
      val prefixEq = keys.take(i).map(p => p.key === p.last)
      val strict = if (k.desc) k.key < k.last else k.key > k.last
      (prefixEq :+ strict).reduce(_ && _)
    }.reduce(_ || _)

  /** Keyset (seek) pagination — the scale path beside [[page]]: the next
    * `pageSize` rows strictly after the last-seen key tuple. The predicate
    * pushes into the scan (min/max row-group pruning on the leading key)
    * and the limit runs as TakeOrderedAndProject: per-partition heaps, no
    * global window, no single-task sort. The caller must include a unique
    * tie-break key (same requirement the reference's OFFSET loop silently
    * lacks, `querysight.py:77-84`). */
  def after(df: DataFrame, keys: Seq[Keyset], pageSize: Int): DataFrame = {
    val order = keys.map(k => if (k.desc) k.key.desc else k.key.asc)
    df.filter(afterPredicate(keys)).orderBy(order: _*).limit(pageSize)
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
