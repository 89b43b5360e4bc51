package graft

import graft.dbt.DbtProject
import graft.functions.{Normalize, SqlTables}
import graft.model.SamplingConfig
import graft.operators.{Filters, Mapping, Patterns, Recommend}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analysis depth — a REAL ordinal enum, deliberately not the reference's
  * lexicographic string comparison (`querysight.py:375,400`, SURVEY.md
  * §7.4 #4). */
sealed abstract class AnalysisLevel(val ordinal: Int, val name: String)
object AnalysisLevel {
  case object DataCollection extends AnalysisLevel(1, "data_collection")
  case object PatternAnalysis extends AnalysisLevel(2, "pattern_analysis")
  case object DbtIntegration extends AnalysisLevel(3, "dbt_integration")
  case object Optimization extends AnalysisLevel(4, "optimization")
  val all: Seq[AnalysisLevel] =
    Seq(DataCollection, PatternAnalysis, DbtIntegration, Optimization)
}

/** Analysis focus (`utils/models.py:24-27`). SLOW adds the acquisition-time
  * duration predicate (`utils/data_acquisition.py:113-114`); FREQUENT has no
  * acquisition-time condition in the reference — here it gets its natural
  * post-aggregation meaning: keep patterns at/above the high-frequency
  * threshold; ALL is a no-op. */
sealed abstract class QueryFocus(val name: String)
object QueryFocus {
  case object Slow extends QueryFocus("slow")
  case object Frequent extends QueryFocus("frequent")
  case object All extends QueryFocus("all")
  def parse(s: String): QueryFocus = s.toLowerCase match {
    case "slow" => Slow
    case "frequent" => Frequent
    case "all" => All
    case other => sys.error(s"unknown focus: $other (slow|frequent|all)")
  }
}

/** Result envelope (`utils/models.py:293-301`): member DataFrames stay
  * lazy/distributed; only export actions materialize. */
final case class AnalysisResult(
    logs: DataFrame,
    patterns: DataFrame,
    coverage: Option[DataFrame],
    recommendations: Option[DataFrame])

/** The reference's `analyze` lifecycle (`querysight.py:281-407`, SURVEY.md
  * §3.1) as a lazy DataFrame pipeline: predicates → normalize+hash →
  * pattern agg → dbt join → rules. No strings, no driver loops — Catalyst
  * sees the whole plan, so filter pushdown and broadcast decisions span
  * the four "levels" that the reference executes as separate materialized
  * stages.
  */
object Analyze {

  /** Level 1: filtered, typed log acquisition (replaces
    * `get_query_logs`'s WHERE-string + LIMIT/OFFSET loop). `sample`
    * honestly implements the reference's dead `--sample-size` option
    * (SURVEY.md §4). */
  def collect(logs: DataFrame, cfg: SamplingConfig, asOf: Column,
              sampleFraction: Option[Double] = None): DataFrame = {
    val filtered = Filters(logs, Filters.fromConfig(cfg, asOf))
    sampleFraction.fold(filtered)(f => filtered.sample(withReplacement = false, f, seed = 42))
  }

  /** Level 2: normalize → fingerprint → aggregate → HAVING → impact.
    * `extractTables`: merge parser-extracted tables into the log's own
    * `tables` array before aggregation (`models.py:128-133`). */
  def patterns(logs: DataFrame, minFrequency: Int = 2,
               minAvgDurationMs: Double = 0.0,
               extractTables: Boolean = false): DataFrame = {
    val withId = logs.withColumn("pattern_id", Normalize.fingerprint(col("query")))
    val agg0 =
      if (withId.columns.contains("tables")) Patterns.aggregateWithTables(withId)
      else Patterns.aggregate(withId)
    // U2 extraction runs AFTER aggregation, on each pattern's exemplar
    // text: table references are a function of the PATTERN (a pattern's
    // rows differ only in literals, which the tokenizer ignores), so the
    // parser executes at pattern cardinality — thousands of rows — instead
    // of log cardinality, which at 100 TB is billions. Log-provided
    // `tables` arrays are genuine per-row data and still union through the
    // aggregate; only the derived extraction moves. The memo UDF on top
    // makes re-analysis across levels/sessions parse each pattern once
    // per executor. (Deliberate semantics: a table name smuggled inside a
    // row's string literal no longer contributes — that was a parse
    // artifact, not a reference.)
    val agg =
      if (!extractTables) agg0
      else {
        val extractedCol = SqlTables.extractedMemo(col("sql_pattern"))
        val merged =
          if (agg0.columns.contains("tables_accessed"))
            array_distinct(concat(
              coalesce(col("tables_accessed"), array().cast("array<string>")),
              extractedCol))
          else extractedCol
        agg0.withColumn("tables_accessed", sort_array(merged))
      }
    Patterns.rankByImpact(Patterns.having(agg, minFrequency, minAvgDurationMs))
  }

  /** Levels 1–4 end to end.
    *
    * `focus` is the reference's `--focus` (`querysight.py:283`): SLOW folds
    * into the acquisition predicate, FREQUENT into the pattern criteria.
    * `criteria` is the reference's post-aggregation `filter_patterns` call
    * (`querysight.py:341-357`). `sampleFraction` is `--sample-size`
    * (`querysight.py:287`). `schemas` (a Schemas.describeTables frame)
    * makes recommendations name actual columns (`ai_suggester.py:56-63`).
    * `recommender` selects the level-4 backend ([[operators.Recommender]]):
    * the deterministic rule engine by default; an [[operators.LlmRecommender]]
    * with a transport closure for the reference's LLM path.
    */
  def run(logs: DataFrame, cfg: SamplingConfig, project: Option[DbtProject],
          level: AnalysisLevel, asOf: Column, minFrequency: Int = 2,
          focus: QueryFocus = QueryFocus.All,
          criteria: Filters.PatternCriteria = Filters.PatternCriteria(),
          sampleFraction: Option[Double] = None,
          schemas: Option[DataFrame] = None,
          recommender: operators.Recommender = operators.RuleRecommender): AnalysisResult = {
    val spark = logs.sparkSession
    val focusedCfg =
      if (focus == QueryFocus.Slow && cfg.slowOnlyThresholdMs.isEmpty)
        cfg.copy(slowOnlyThresholdMs = Some(1000.0)) // data_acquisition.py:113-114
      else cfg
    val focusedCriteria =
      if (focus == QueryFocus.Frequent && criteria.minFrequency.isEmpty)
        criteria.copy(minFrequency = Some(Recommend.HighFrequencyThreshold))
      else criteria
    val collected = collect(logs, focusedCfg, asOf, sampleFraction)
    if (level.ordinal < AnalysisLevel.PatternAnalysis.ordinal)
      return AnalysisResult(collected, collected.limit(0), None, None)

    // Model selection waits for dbt enrichment (querysight.py:386-397);
    // everything else applies right after aggregation (querysight.py:341-357).
    val pats = Filters.applyCriteria(
      patterns(collected, minFrequency,
        extractTables = collected.columns.contains("tables")),
      focusedCriteria.copy(selectModels = Seq.empty))
    if (level.ordinal < AnalysisLevel.DbtIntegration.ordinal || project.isEmpty)
      return AnalysisResult(collected, pats, None, None)

    val proj = project.get
    val lookup = Mapping.lookupDf(spark, proj)
    // Persisted: every level ≥ DbtIntegration fans out from this frame
    // (coverage + recommendations + the caller's own reads), and without a
    // cache each consumer re-executes the whole log→agg→enrich subtree —
    // Spark has no cross-consumer CSE. Post-aggregation the frame is one
    // row per distinct pattern, so at 100 TB of logs it is still tiny;
    // caching it is the plan you'd hand-write.
    val enriched = Filters.applyCriteria(
      Mapping.enrichWithModels(pats, lookup),
      Filters.PatternCriteria(selectModels = focusedCriteria.selectModels))
      .persist()
    // Coverage reflects the post-selection pattern set, as the reference
    // recalculates it after model filtering (querysight.py:396-397).
    val cov = Mapping.coverage(enriched, Mapping.modelsDf(spark, proj),
      Mapping.edgesDf(spark, proj))
    if (level.ordinal < AnalysisLevel.Optimization.ordinal)
      return AnalysisResult(collected, enriched, Some(cov), None)

    AnalysisResult(collected, enriched, Some(cov),
      Some(recommender.recommend(enriched, schemas)))
  }

  /** S9: JSON export of the top-N patterns (driver-side, post-filter —
    * mirrors `querysight.py:815-848`). `sortBy` is the reference's W3
    * user-selected sort (`querysight.py:63-75`: frequency | duration |
    * memory); default keeps impact ranking. */
  def exportJson(result: AnalysisResult, topN: Int = 20,
                 sortBy: String = "impact"): String = {
    val key = sortBy match {
      case "frequency" => col("frequency")
      case "duration" => col("avg_duration_ms")
      case "memory" => col("memory_usage")
      case _ => col("impact")
    }
    val rows = result.patterns.orderBy(key.desc_nulls_last, col("pattern_id"))
      .limit(topN).toJSON.collect()
    rows.mkString("[", ",", "]")
  }
}
