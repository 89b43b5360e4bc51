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

  /** `--force-reset` (`querysight.py:292`, reset impl
    * `cache_manager.py`): wipe the store directory and its TTL sidecar. */
  def reset(dir: String): Unit = deleteRecursively(Paths.get(dir))

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
