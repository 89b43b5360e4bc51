package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle skew diagnostic: the per-key frequency report a pipeline
  * runs BEFORE a big join/groupBy to decide whether a key needs salting
  * ([[Patterns]]' salted path) or AQE skew-join handling — at 100 TB a
  * single hot key is the difference between a 10-minute and a 10-hour
  * stage, and the report is one map-combinable aggregate.
  *
  * Output: the `k` heaviest keys with exact counts and their share of all
  * rows in integer basis points (`n * 10000 / total` — BIGINT division,
  * bit-identical in any engine; no float ratios to drift). */
object SkewReport {

  def topKeys(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      // DIV, not `/`: Column./ is DOUBLE division, whose rounded quotient
      // can truncate differently than exact integer division at the edge.
      // DECIMAL(38,0) first: n * 10000 in BIGINT overflows past ~9.2e14
      // rows per key, which a 100 TB corpus can reach.
      .select(col("key"), col("n"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 10000) DIV total AS BIGINT)")
          .as("share_bp"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }
}
