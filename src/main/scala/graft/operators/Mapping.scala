package graft.operators

import graft.dbt.DbtProject
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern ↔ dbt-model mapping and coverage (SURVEY.md J1–J4, A7, SO1–SO4).
  *
  * The reference resolves each accessed table with three dict lookups in
  * Python (`dbt_mapper.py:263-300`) and computes coverage with set algebra
  * (`models.py:303-372`). Here the lookup table (KBs) becomes a broadcast
  * DataFrame and the resolution is ONE exploded broadcast-hash join with a
  * 3-way coalesce — per-row driver lookups become a codegen'd join that
  * scales to any number of patterns without shuffling the big side.
  */
object Mapping {

  /** The 3-tier lookup as a broadcastable DataFrame `(ref, model)`. */
  def lookupDf(spark: SparkSession, project: DbtProject): DataFrame = {
    import spark.implicits._
    project.tableToModel.toSeq.toDF("ref", "model")
  }

  /** Dependency edges `(model, depends_on)` (`models.py:206-222`). */
  def edgesDf(spark: SparkSession, project: DbtProject): DataFrame = {
    import spark.implicits._
    project.edges.toDF("model", "depends_on")
  }

  /** Model universe `(model)`. */
  def modelsDf(spark: SparkSession, project: DbtProject): DataFrame = {
    import spark.implicits._
    project.models.keys.toSeq.sorted.toDF("model")
  }

  /** J1: resolve every accessed table of every pattern to a dbt model.
    *
    * Input: patterns with `pattern_id` and `tables_accessed: array<string>`.
    * Output: one row per (pattern_id, table) with a nullable `model`,
    * resolved with the reference's precedence: exact ref, then bare table
    * name, then `schema.table` — as a single broadcast join against the
    * union of all three key forms, tier kept as a priority column.
    */
  def resolveTables(patterns: DataFrame, lookup: DataFrame): DataFrame = {
    val exploded = patterns
      .select(col("pattern_id"), explode(col("tables_accessed")).as("tbl"))
      .withColumn("tbl_lower", lower(col("tbl")))
      .withColumn("parts", split(col("tbl_lower"), "\\."))
      .withColumn("k_exact", col("tbl_lower"))
      .withColumn("k_bare", element_at(col("parts"), -1))
      .withColumn("k_st",
        when(size(col("parts")) >= 2,
          concat_ws(".", slice(col("parts"), -2, 2))))
    // One broadcast join per tier keeps the plan shape explicit and each
    // join key equi — Catalyst turns all three into broadcast hash joins.
    def tier(df: DataFrame, key: String, out: String) =
      df.join(broadcast(lookup.withColumnRenamed("ref", key)
        .withColumnRenamed("model", out)), Seq(key), "left")
    val resolved = tier(tier(tier(exploded, "k_exact", "m_exact"),
      "k_bare", "m_bare"), "k_st", "m_st")
    resolved.select(col("pattern_id"), col("tbl"),
      coalesce(col("m_exact"), col("m_bare"), col("m_st")).as("model"))
  }

  /** Enrich patterns with `dbt_models_used` and `unmapped_tables`
    * (SO4, `ai_suggester.py:53`). */
  def enrichWithModels(patterns: DataFrame, lookup: DataFrame): DataFrame = {
    val resolved = resolveTables(patterns, lookup)
      .groupBy("pattern_id")
      .agg(
        sort_array(array_distinct(collect_list(col("model")))).as("dbt_models_used"),
        sort_array(collect_list(when(col("model").isNull, col("tbl"))))
          .as("unmapped_tables"))
    patterns.join(resolved, Seq("pattern_id"), "left")
      .withColumn("dbt_models_used",
        coalesce(col("dbt_models_used"), array().cast("array<string>")))
      .withColumn("unmapped_tables",
        coalesce(col("unmapped_tables"), array().cast("array<string>")))
  }

  /** J3: 1-hop upstream expansion (`models.py:341-343`): used models plus
    * everything they directly depend on. */
  def expandOneHop(usedModels: DataFrame, edges: DataFrame): DataFrame = {
    val parents = usedModels.join(broadcast(edges), Seq("model"))
      .select(col("depends_on").as("model"))
    usedModels.select("model").unionByName(parents).distinct()
  }

  /** J4: parent/child rollup per model (two self-joins on the edge list,
    * `querysight.py:230-255`). */
  def parentChild(models: DataFrame, edges: DataFrame): DataFrame =
    models
      .join(broadcast(edges), Seq("model"), "left")
      .groupBy("model")
      .agg(sort_array(array_distinct(collect_list(col("depends_on")))).as("depends_on"))
      .join(broadcast(edges.select(col("depends_on").as("model"),
        col("model").as("child"))), Seq("model"), "left")
      .groupBy("model", "depends_on")
      .agg(sort_array(array_distinct(collect_list(col("child")))).as("referenced_by"))

  /** A7/SO1: coverage metrics (`models.py:303-372`): which fraction of the
    * model universe is exercised by the analyzed patterns; unused via
    * anti-join (the idiomatic form of the reference's set difference). */
  def coverage(enrichedPatterns: DataFrame, allModels: DataFrame, edges: DataFrame): DataFrame = {
    val used = enrichedPatterns
      .select(explode(col("dbt_models_used")).as("model")).distinct()
    val usedExpanded = expandOneHop(used, edges)
      .join(allModels, Seq("model"), "left_semi")
    val unused = allModels.join(usedExpanded, Seq("model"), "left_anti")
    usedExpanded.agg(count(lit(1)).as("n_used"))
      .crossJoin(unused.agg(count(lit(1)).as("n_unused"),
        array_join(sort_array(collect_list(col("model"))), ",").as("unused_models")))
      .withColumn("n_total", col("n_used") + col("n_unused"))
      .withColumn("pct_covered",
        col("n_used").cast("double") * 100.0 / col("n_total").cast("double"))
      .select("n_total", "n_used", "n_unused", "pct_covered", "unused_models")
  }
}
