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

  /** Rule table: input needs `sql_pattern`, `frequency`, `avg_duration_ms`,
    * `tables_accessed`, `dbt_models_used`, `unmapped_tables`. Produces one
    * row per (pattern, recommendation). */
  def recommend(enriched: DataFrame): DataFrame = {
    val base = enriched
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
          lit("High-frequency slow query: add primary-key/order-by index on filter columns")
            .as("description"))),
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
