package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8/A6/F12: parquet-backed pattern history replacing the reference's
  * 14-table SQLite cache (`utils/cache_manager.py:63-247`).
  *
  * Arrays persist natively in Parquet, so the reference's junction tables
  * and JSON-encoded columns disappear. Incremental enrichment keeps the
  * reference's additive upsert semantics (`cache_manager.py:591-607`):
  * union + re-aggregate via [[Patterns.merge]] — the same decomposable
  * aggregate that Structured Streaming would run with keyed state.
  *
  * TTL validity (`cache_manager.py:33-39,346-354`) is a sidecar
  * `_ttl_expiry_ms` file per store, not engine logic.
  */
object PatternStore {

  /** Level TTLs from the reference (hours): data collection 24, pattern
    * analysis 12, dbt integration 6, optimization 3. */
  val LevelTtlHours: Map[Int, Int] = Map(1 -> 24, 2 -> 12, 3 -> 6, 4 -> 3)

  private def ttlPath(dir: String) = Paths.get(dir, "_ttl_expiry_ms")

  def save(patterns: DataFrame, dir: String, ttlHours: Int, nowMs: Long): Unit = {
    patterns.write.mode("overwrite").parquet(dir)
    Files.writeString(ttlPath(dir), (nowMs + ttlHours * 3600L * 1000L).toString)
  }

  def isValid(dir: String, nowMs: Long): Boolean =
    Files.exists(ttlPath(dir)) &&
      Files.readString(ttlPath(dir)).trim.toLong > nowMs

  def load(spark: SparkSession, dir: String): Option[DataFrame] =
    if (Files.exists(Paths.get(dir))) Some(spark.read.parquet(dir)) else None

  /** A6: merge freshly computed patterns into history (additive upsert —
    * re-running over the same logs double-counts, as the reference does;
    * documented quirk, SURVEY.md §7.4 #3). */
  def enrich(spark: SparkSession, fresh: DataFrame, dir: String,
             ttlHours: Int = 12, nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val merged = load(spark, dir) match {
      case Some(hist) => Patterns.merge(fresh, hist.select(fresh.columns.map(org.apache.spark.sql.functions.col): _*))
      case None => fresh
    }
    // Two-phase write: the merge plan reads the directory being replaced.
    val tmp = dir + "_staging"
    merged.write.mode("overwrite").parquet(tmp)
    val out = spark.read.parquet(tmp)
    save(out, dir, ttlHours, nowMs) // write action: dir fully materialized here
    deleteRecursively(Paths.get(tmp))
    spark.read.parquet(dir)
  }

  /** A6 at 100 TB: the reference's hottest recurring operation is this
    * enrichment (`cache_manager.py:591-607`), and [[enrich]]'s
    * union+re-agg re-shuffles the FULL accumulated history on
    * `pattern_id` every run. The scale path keeps history as a
    * `pattern_id`-bucketed, bucket-sorted catalog table
    * ([[graft.sources.Sinks.bucketedTable]]): the merge becomes a
    * sort-merge full-outer join ([[Patterns.mergeJoin]]) where the
    * history scan needs NO Exchange and NO Sort (bucket layout provides
    * both) — only the fresh delta, orders of magnitude smaller, pays a
    * shuffle. One bucket-write at save time, amortized over every later
    * enrichment. Plan asserted in `PlanAuditSpec`; semantics proven equal
    * to [[Patterns.merge]] there too.
    *
    * Deployments should also set
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`: the layout
    * writes one file per bucket pre-sorted by `pattern_id` (`sortBy`),
    * and with the flag on the history-side Sort is eliminated too (the
    * planner then trusts bucket sort metadata) — leaving the history
    * scan with neither Exchange nor Sort, the fully streaming merge.
    *
    * Swap is two-phase like [[enrich]]: merged history is written to a
    * staging table (the merge plan reads the table being replaced), then
    * drop + rename. */
  def enrichBucketed(spark: SparkSession, fresh: DataFrame, table: String,
                     numBuckets: Int = 32): DataFrame = {
    val sortedBuckets = Seq("pattern_id")
    if (!spark.catalog.tableExists(table)) {
      graft.sources.Sinks.bucketedTable(fresh, table, "pattern_id",
        numBuckets, sortCols = sortedBuckets)
    } else {
      val merged = Patterns.mergeJoin(fresh, spark.table(table))
      val staging = table + "_staging"
      graft.sources.Sinks.bucketedTable(merged, staging, "pattern_id",
        numBuckets, sortCols = sortedBuckets)
      spark.sql(s"DROP TABLE `$table`")
      spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    }
    spark.table(table)
  }

  /** `--force-reset` (`querysight.py:292`, reset impl
    * `cache_manager.py`): wipe the store directory and its TTL sidecar. */
  def reset(dir: String): Unit = deleteRecursively(Paths.get(dir))

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
