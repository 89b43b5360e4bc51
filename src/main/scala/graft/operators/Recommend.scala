package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** U4: optimization recommendations, offline rule engine.
  *
  * The reference builds an LLM prompt per pattern
  * (`ai_suggester.py:36-206`) and parses the response. The deterministic
  * signals it feeds the LLM — pattern-type keywords, high-frequency
  * (>100), long-running (>1000 ms), system-table classification, unmapped
  * tables — become the rule engine here; an LLM backend can be plugged in
  * driver-side later (SURVEY.md §7.4 #5: no egress in this environment).
  * Unlike the reference's per-pattern HTTP loop, this is a single
  * projection over the pattern DataFrame — recommendation generation
  * scales with the cluster.
  */
object Recommend {

  val HighFrequencyThreshold = 100L
  val LongRunningMsThreshold = 1000.0

  /** F11: does the pattern touch ONLY system tables
    * (`ai_suggester.py:38-50`)? Such patterns get no recommendation. */
  def onlySystemTables(tables: Column): Column =
    !exists(tables, t => Filters.SystemPrefixes
      .map(p => !lower(t).startsWith(p)).reduce(_ && _))

  /** Keyword pattern-type detection (`ai_suggester.py:79-96`). */
  def patternTypes(sqlPattern: Column): Column = {
    val indicators = Seq(
      "group by" -> "Aggregation", "join" -> "Join", "where" -> "Filter",
      "with" -> "CTE", "union" -> "SetOperation", "window" -> "Window",
      "having" -> "ComplexFilter", "order by" -> "Sorting")
    val lowered = lower(sqlPattern)
    val hits = indicators.map { case (kw, label) =>
      when(lowered.contains(kw), lit(label)) }
    val arr = filter(array(hits: _*), x => x.isNotNull)
    when(size(arr) === 0 && lowered.contains("select"),
      array(lit("Simple Select"))).otherwise(arr)
  }

  /** Candidate index columns per pattern: columns of the pattern's accessed
    * tables whose names appear in the normalized SQL text — the same
    * schema-into-suggestion join the reference performs when building its
    * prompt (`ai_suggester.py:56-63`). `schemas` is a
    * [[graft.sources.Schemas.describeTables]] frame; it is catalog-sized, so
    * it broadcasts, and the result is keyed by `pattern_id` (pattern-sized,
    * small relative to the logs at any scale). */
  def referencedColumns(enriched: DataFrame, schemas: DataFrame): DataFrame =
    enriched
      .select(col("pattern_id"), lower(col("sql_pattern")).as("pat_lc"),
        explode(col("tables_accessed")).as("table_name"))
      .join(broadcast(schemas.select("table_name", "column_name")), Seq("table_name"))
      .filter(col("pat_lc").contains(lower(col("column_name"))))
      .groupBy("pattern_id")
      .agg(array_sort(collect_set(
        concat_ws(".", col("table_name"), col("column_name")))).as("schema_columns"))

  /** Rule table: input needs `sql_pattern`, `frequency`, `avg_duration_ms`,
    * `tables_accessed`, `dbt_models_used`, `unmapped_tables`. Produces one
    * row per (pattern, recommendation). With `schemas`, INDEX
    * recommendations name the actual filter columns. */
  def recommend(enriched: DataFrame,
                schemas: Option[DataFrame] = None): DataFrame = {
    val withCols = schemas match {
      case Some(s) => enriched.join(referencedColumns(enriched, s), Seq("pattern_id"), "left")
      case None => enriched.withColumn("schema_columns", lit(null).cast("array<string>"))
    }
    val base = withCols
      .filter(!onlySystemTables(col("tables_accessed")))
      .withColumn("pattern_types", patternTypes(col("sql_pattern")))
      .withColumn("is_high_frequency", col("frequency") > HighFrequencyThreshold)
      .withColumn("is_long_running", col("avg_duration_ms") > LongRunningMsThreshold)
    val recs = array(
      when(col("is_long_running") && array_contains(col("pattern_types"), "Join"),
        struct(lit("REWRITE_QUERY").as("rec_type"),
          lit("Long-running join pattern: review join order and pre-aggregate inputs")
            .as("description"))),
      when(col("is_long_running") && array_contains(col("pattern_types"), "Aggregation"),
        struct(lit("MATERIALIZE").as("rec_type"),
          lit("Long-running aggregation: materialize as an incremental dbt model")
            .as("description"))),
      when(col("is_high_frequency") && !col("is_long_running"),
        struct(lit("CACHE").as("rec_type"),
          lit("High-frequency fast query: candidate for result caching")
            .as("description"))),
      when(col("is_high_frequency") && col("is_long_running"),
        struct(lit("INDEX").as("rec_type"),
          concat(lit("High-frequency slow query: add primary-key/order-by index on filter columns"),
            when(size(col("schema_columns")) > 0,
              concat(lit(": "), array_join(col("schema_columns"), ", ")))
              .otherwise(lit(""))).as("description"))),
      when(size(col("unmapped_tables")) > 0,
        struct(lit("NEW_DBT_MODEL").as("rec_type"),
          lit("Tables accessed outside dbt lineage: model them in dbt")
            .as("description"))))
    base
      .withColumn("rec", explode(filter(recs, r => r.isNotNull)))
      .withColumn("impact_level",
        when(col("frequency").cast("double") * col("avg_duration_ms") > 100000.0, "HIGH")
          .when(col("frequency").cast("double") * col("avg_duration_ms") > 10000.0, "MEDIUM")
          .otherwise("LOW"))
      .select(col("pattern_id"), col("rec.rec_type").as("rec_type"),
        col("rec.description").as("description"), col("impact_level"),
        array_join(col("pattern_types"), ",").as("pattern_types"))
  }
}
