package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a key column —
  * the sketch path for frequency estimation when the key cardinality is
  * unbounded and exact per-key counts stop fitting anywhere: the sketch
  * is a fixed `depth × width` grid of counters regardless of input size.
  *
  * Engine-portable by construction, unlike library sketches whose binary
  * layouts are implementation-specific: the row hashes are the same
  * md5-bucket rule as [[Sampling.hashBucket]] (seed-prefixed), counters
  * are exact BIGINT sums, and the estimate is a plain `min` — so DuckDB
  * recomputes the ENTIRE sketch bit-for-bit and the oracle covers the
  * whole build/estimate algebra (`q_cms_heavy`), which no opaque sketch
  * blob could offer.
  *
  * Scale shape: the build explodes each row into `depth` (row, bucket)
  * cells, but the hash-agg partial-combines map-side, so the exchange
  * carries at most partitions × depth × width rows — INDEPENDENT of
  * corpus size. Estimates join the tiny broadcast grid. Standard error:
  * est − true ≤ 2N/width with probability 1 − (1/2)^depth. */
object Sketches {

  private def cell(keyCol: String, seed: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$seed:"), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("long") % width

  /** The sketch grid: (row, bucket, cnt) — depth × width cells. */
  def cmsBuild(df: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(posexplode(array((0 until depth).map(s =>
        cell(keyCol, s, width)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for the distinct keys of `keys`: min over the
    * sketch rows of each key's cell counter (the classic CMS upper-bound
    * estimate: `n_est >= n_true`, within 2N/width w.h.p.). A cell absent
    * from the grid is a ZERO counter, so the probe LEFT-joins and
    * coalesces — an unseen key estimates 0 instead of silently vanishing
    * (an inner join would also overestimate keys with some empty cells by
    * taking the min over the surviving cells only). */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val k = keys.select(col(keyCol).as("key")).distinct()
    val cells = k.select(col("key"), posexplode(array((0 until depth).map(s =>
      cell("key", s, width)): _*)).as(Seq("row", "bucket")))
    cells.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Merge sketches built over disjoint (or overlapping — counters just
    * add) slices of a stream: cell-wise counter addition. This is the
    * property that makes the sketch DISTRIBUTABLE: per-partition/per-day
    * grids union into the global grid with a fixed-size shuffle, and a
    * grid built incrementally equals one built in a single pass
    * (`cmsMerge(build(A), build(B)) == build(A ∪ B)`, spec-proven and
    * under the q_cms_merge oracle). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** DuckDB twin of one sketch cell for oracle SQL. */
  def duckdbCellSql(keyExpr: String, seed: Int, width: Int): String =
    s"(('0x' || substring(md5('cms$seed:' || CAST($keyExpr AS VARCHAR)), 1, 8))::BIGINT % $width)"
}
