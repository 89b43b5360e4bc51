package graft.operators

import graft.model.SamplingConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter builders F1–F12 (SURVEY.md §2.3). The reference concatenates SQL
  * WHERE strings (`utils/data_acquisition.py:82-114`); here every filter is
  * a `Column` predicate so Catalyst pushes it into the parquet scan
  * (visible as `PushedFilters` in `.explain`), and time-range predicates
  * partition-prune on date-partitioned layouts.
  */
object Filters {

  /** F1: event_time within the last `days` of `asOf` (reference uses
    * `now()`; an explicit `asOf` keeps runs reproducible). */
  def timeRange(ts: Column, asOf: Column, days: Int): Column =
    ts >= (asOf - expr(s"INTERVAL $days DAYS"))

  /** F2: case-insensitive user include/exclude
    * (`utils/data_acquisition.py:90-95`). */
  def userInclude(user: Column, users: Seq[String]): Column =
    lower(user).isInCollection(users.map(_.toLowerCase))

  def userExclude(user: Column, users: Seq[String]): Column =
    !lower(user).isInCollection(users.map(_.toLowerCase))

  /** F3: query-kind membership (`utils/data_acquisition.py:98-100`). */
  def queryKinds(kind: Column, kinds: Seq[String]): Column =
    upper(kind).isInCollection(kinds.map(_.toUpperCase))

  /** F4: any element of the `tables` array LIKE any selected pattern,
    * OR-joined (`utils/data_acquisition.py:103-107`). */
  def tablesLike(tables: Column, patterns: Seq[String]): Column =
    patterns.map(p => exists(tables, t => t.like(p))).reduce(_ || _)

  /** F5: slow-query focus (`utils/data_acquisition.py:113-114`). */
  def slowOnly(durationMs: Column, thresholdMs: Double = 1000.0): Column =
    durationMs > thresholdMs

  /** F6: pattern-id membership (`utils/filtering.py:24-26`). */
  def patternIds(patternId: Column, ids: Seq[String]): Column =
    patternId.isInCollection(ids)

  /** F9/F10: array-overlap keep (`utils/filtering.py:37-44`). */
  def overlaps(arr: Column, selected: Seq[String]): Column =
    arrays_overlap(arr, lit(selected.toArray))

  /** F11: drop patterns touching only system tables
    * (`utils/ai_suggester.py:38-50`). */
  val SystemPrefixes: Seq[String] = Seq("system.", "information_schema.", "pg_catalog.")
  def touchesUserTables(tables: Column): Column =
    exists(tables, t => SystemPrefixes.map(p => !t.startsWith(p)).reduce(_ && _))

  /** Compose a SamplingConfig into one conjunction (missing pieces → no-op).
    * Column names follow the QueryLog schema (FIXTURES.md §1). */
  def fromConfig(cfg: SamplingConfig, asOf: Column): Seq[Column] = {
    val b = Seq.newBuilder[Column]
    cfg.days.foreach(d => b += timeRange(col("query_start_time"), asOf, d))
    if (cfg.includeUsers.nonEmpty) b += userInclude(col("user"), cfg.includeUsers)
    if (cfg.excludeUsers.nonEmpty) b += userExclude(col("user"), cfg.excludeUsers)
    if (cfg.queryKinds.nonEmpty) b += queryKinds(col("query_kind"), cfg.queryKinds)
    if (cfg.selectTablesLike.nonEmpty) b += tablesLike(col("tables"), cfg.selectTablesLike)
    cfg.slowOnlyThresholdMs.foreach(t => b += slowOnly(col("query_duration_ms"), t))
    b.result()
  }

  def apply(df: DataFrame, predicates: Seq[Column]): DataFrame =
    predicates.foldLeft(df)(_ filter _)

  /** Post-aggregation pattern criteria — the reference's `apply_filters`
    * (`utils/filtering.py:6-46`): F6 ids, F7 min avg duration, F8 min
    * frequency, F9/F10 table/model overlap, composed as one conjunction. */
  final case class PatternCriteria(
      patternIds: Seq[String] = Seq.empty,
      minAvgDurationMs: Option[Double] = None,
      minFrequency: Option[Long] = None,
      selectTables: Seq[String] = Seq.empty,
      selectModels: Seq[String] = Seq.empty)

  def applyCriteria(patterns: DataFrame, c: PatternCriteria): DataFrame = {
    val b = Seq.newBuilder[Column]
    if (c.patternIds.nonEmpty) b += patternIds(col("pattern_id"), c.patternIds)
    c.minAvgDurationMs.foreach(x => b += (col("avg_duration_ms") >= x))
    c.minFrequency.foreach(x => b += (col("frequency") >= x))
    if (c.selectTables.nonEmpty) b += overlaps(col("tables_accessed"), c.selectTables)
    if (c.selectModels.nonEmpty) b += overlaps(col("dbt_models_used"), c.selectModels)
    apply(patterns, b.result())
  }
}
