package graft.model

import java.sql.Timestamp

/** Typed data model (SURVEY.md §1). Case classes give `Dataset[T]` encoders
  * at API boundaries; internally everything stays `DataFrame` so Catalyst
  * can prune/push down.
  */

/** Raw query-log row — the 16-column `system.query_log` projection the
  * reference reads (`utils/models.py:29-47`,
  * `utils/data_acquisition.py:120-141`). */
final case class QueryLog(
    query_id: String,
    query: String,
    query_kind: String,
    user: String,
    query_start_time: Timestamp,
    query_duration_ms: Double,
    read_rows: Long,
    read_bytes: Long,
    result_rows: Long,
    result_bytes: Long,
    memory_usage: Long,
    normalized_query_hash: String,
    current_database: String = "",
    databases: Seq[String] = Seq.empty,
    tables: Seq[String] = Seq.empty,
    columns: Seq[String] = Seq.empty)

/** Aggregated query pattern (`utils/models.py:95-165`). `avg_duration_ms`
  * is derived (total/frequency) — kept materialized for parity with the
  * reference's serialized form. */
final case class QueryPattern(
    pattern_id: String,
    sql_pattern: String,
    frequency: Long,
    total_duration_ms: Double,
    avg_duration_ms: Double,
    first_seen: Timestamp,
    last_seen: Timestamp,
    users: Seq[String],
    tables_accessed: Seq[String],
    memory_usage: Long,
    total_read_rows: Long,
    total_read_bytes: Long)

/** dbt model-graph node (`utils/models.py:206-222`): adjacency is kept as a
  * separate edge DataFrame `(model, depends_on)`; this is node metadata. */
final case class DbtModel(
    name: String,
    schema: String,
    materialization: String,
    physical_name: String,
    depends_on: Seq[String] = Seq.empty)

/** Query-analysis filter parameters (`utils/models.py:251-262`) — becomes a
  * conjunction of `Column` predicates, never SQL strings. */
final case class SamplingConfig(
    days: Option[Int] = None,
    includeUsers: Seq[String] = Seq.empty,
    excludeUsers: Seq[String] = Seq.empty,
    queryKinds: Seq[String] = Seq.empty,
    selectTablesLike: Seq[String] = Seq.empty,
    slowOnlyThresholdMs: Option[Double] = None)

/** Rule-derived optimization recommendation (`utils/models.py:402-409`). */
final case class Recommendation(
    pattern_id: String,
    rec_type: String,
    description: String,
    impact_level: String)
