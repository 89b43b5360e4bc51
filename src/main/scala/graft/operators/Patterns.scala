package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The core pattern aggregation (SURVEY.md A1/A2/A6/A8, P3/P4).
  *
  * The reference does this with a driver-side dict of mutable
  * `QueryPattern`s (`utils/data_acquisition.py:194-232`,
  * `utils/models.py:113-133`). Here it is one hash aggregate: Tungsten
  * gives partial (map-side) aggregation, spill, and codegen for free, and
  * the same plan scales out — the groupBy key is the pattern hash, so the
  * single shuffle is on exactly the join/agg key a 1000-executor cluster
  * would want. The reference's `update_from_pattern` merge
  * (`utils/models.py:135-154`) IS Spark's partial→final merge contract,
  * which also makes incremental enrichment (A6) a plain union+re-aggregate:
  * every aggregate below is decomposable (sum/min/max/set-union).
  */
object Patterns {

  /** Column set every query-log-shaped input must carry. */
  val requiredColumns: Seq[String] = Seq(
    "pattern_id", "query", "user", "query_start_time", "query_duration_ms",
    "memory_usage", "read_rows", "read_bytes")

  /** A1: aggregate log rows (already carrying a `pattern_id` identity column,
    * see [[graft.functions.Normalize]]) into per-pattern metrics.
    *
    * `min(query)` keeps one deterministic exemplar SQL text per pattern in
    * constant memory (the reference keeps the first-seen text,
    * `data_acquisition.py:206`; any exemplar is equivalent under
    * normalization — and a collect_set-based exemplar would buffer every
    * distinct raw text per group, which at 100 TB is the difference
    * between a streaming aggregate and an OOM). Set-valued columns that
    * are genuinely bounded (users) use `collect_set` + `sort_array` for
    * order-stable output.
    */
  def aggregate(logs: DataFrame): DataFrame =
    logs.groupBy("pattern_id").agg(
      min(col("query")).as("sql_pattern"),
      count(lit(1)).as("frequency"),
      sum("query_duration_ms").as("total_duration_ms"),
      min("query_start_time").as("first_seen"),
      max("query_start_time").as("last_seen"),
      sort_array(collect_set(col("user"))).as("users"),
      sum("memory_usage").as("memory_usage"),
      sum("read_rows").as("total_read_rows"),
      sum("read_bytes").as("total_read_bytes"))
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))

  /** Same aggregate over an input that also carries an
    * `ArrayType(String)` `tables` column (set-union across rows —
    * `utils/models.py:128-133`). */
  def aggregateWithTables(logs: DataFrame): DataFrame =
    logs.groupBy("pattern_id").agg(
      min(col("query")).as("sql_pattern"),
      count(lit(1)).as("frequency"),
      sum("query_duration_ms").as("total_duration_ms"),
      min("query_start_time").as("first_seen"),
      max("query_start_time").as("last_seen"),
      sort_array(collect_set(col("user"))).as("users"),
      sort_array(array_distinct(flatten(collect_list(col("tables"))))).as("tables_accessed"),
      sum("memory_usage").as("memory_usage"),
      sum("read_rows").as("total_read_rows"),
      sum("read_bytes").as("total_read_bytes"))
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))

  /** A1 under key skew: salted two-phase aggregation. A handful of
    * ultra-hot pattern hashes (every ORM emitting the same SELECT) can
    * pin a single reducer at 100 TB; salting splits each key across
    * `saltBuckets` partial groups, then merges partials — exactly the
    * [[merge]] contract, so the result is identical to [[aggregate]].
    * The salt is derived from row content (deterministic), not rand().
    * AQE's skew handling covers joins but not aggregates, hence manual. */
  def aggregateSalted(logs: DataFrame, saltBuckets: Int = 64): DataFrame = {
    val salted = logs.withColumn("_salt",
      pmod(xxhash64(col("query_start_time"), col("user")), lit(saltBuckets)))
    val partial = salted.groupBy(col("pattern_id"), col("_salt")).agg(
      min(col("query")).as("sql_pattern"),
      count(lit(1)).as("frequency"),
      sum("query_duration_ms").as("total_duration_ms"),
      min("query_start_time").as("first_seen"),
      max("query_start_time").as("last_seen"),
      sort_array(collect_set(col("user"))).as("users"),
      sum("memory_usage").as("memory_usage"),
      sum("read_rows").as("total_read_rows"),
      sum("read_bytes").as("total_read_bytes"))
    partial.groupBy("pattern_id").agg(
      min(col("sql_pattern")).as("sql_pattern"),
      sum("frequency").as("frequency"),
      sum("total_duration_ms").as("total_duration_ms"),
      min("first_seen").as("first_seen"),
      max("last_seen").as("last_seen"),
      sort_array(array_distinct(flatten(collect_list(col("users"))))).as("users"),
      sum("memory_usage").as("memory_usage"),
      sum("total_read_rows").as("total_read_rows"),
      sum("total_read_bytes").as("total_read_bytes"))
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
  }

  /** F7/F8 post-aggregation HAVING (`utils/filtering.py:29-34`,
    * `utils/data_acquisition.py:221-225`). */
  def having(patterns: DataFrame,
             minFrequency: Int = 1,
             minAvgDurationMs: Double = 0.0): DataFrame =
    patterns.filter(col("frequency") >= minFrequency &&
      col("avg_duration_ms") >= minAvgDurationMs)

  /** P4/A8: impact = frequency × avg duration (`utils/data_acquisition.py:230`). */
  def impact: Column = col("frequency") * col("avg_duration_ms")

  def rankByImpact(patterns: DataFrame): DataFrame =
    patterns.withColumn("impact", impact).orderBy(desc("impact"), col("pattern_id"))

  /** P3: complexity score (`utils/models.py:156-165`) —
    * 0.4·min(avgDur/1000,1) + 0.4·min(freq/100,1) + 0.2·min(tables/5,1). */
  def complexityScore(avgDurationMs: Column, frequency: Column, nTables: Column): Column =
    least(avgDurationMs / 1000.0, lit(1.0)) * 0.4 +
      least(frequency.cast("double") / 100.0, lit(1.0)) * 0.4 +
      least(nTables.cast("double") / 5.0, lit(1.0)) * 0.2

  /** A2/A6/J5: merge two pattern sets with the reference's additive
    * upsert semantics (`utils/cache_manager.py:591-607`): same-id patterns
    * combine (sums add, sets union, first/last seen widen), disjoint ids
    * pass through. Because every A1 aggregate is decomposable, merge =
    * union + re-aggregate — no custom Aggregator needed, and the plan is
    * identical in batch or as a streaming stateful agg.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    require(cols.toSet == b.columns.toSet, s"pattern schemas differ: $cols vs ${b.columns.toSeq}")
    a.unionByName(b)
      .groupBy("pattern_id").agg(
        min(col("sql_pattern")).as("sql_pattern"),
        sum("frequency").as("frequency"),
        sum("total_duration_ms").as("total_duration_ms"),
        min("first_seen").as("first_seen"),
        max("last_seen").as("last_seen"),
        sort_array(array_distinct(flatten(collect_list(col("users"))))).as("users"),
        sum("memory_usage").as("memory_usage"),
        sum("total_read_rows").as("total_read_rows"),
        sum("total_read_bytes").as("total_read_bytes"))
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
  }

  /** [[merge]] re-expressed as a full-outer JOIN-merge — semantically
    * identical (spec-proven), but shaped for the bucketed-history scale
    * path ([[PatternStore.enrichBucketed]]): `union + groupBy` destroys
    * the history side's bucketed outputPartitioning and re-shuffles ALL
    * accumulated history on every enrichment, while a sort-merge join
    * against a `pattern_id`-bucketed, bucket-sorted history scan needs no
    * Exchange and no Sort on that side — only the (orders-of-magnitude
    * smaller) fresh delta pays a shuffle. */
  def mergeJoin(fresh: DataFrame, hist: DataFrame): DataFrame = {
    val dataCols = fresh.columns.toSeq.filterNot(_ == "avg_duration_ms")
    require(dataCols.toSet.subsetOf(hist.columns.toSet),
      s"pattern schemas differ: $dataCols vs ${hist.columns.toSeq}")
    val f = fresh.select(dataCols.map(col): _*).as("f")
    val h = hist.select(dataCols.map(col): _*).as("h")
    def both(c: String) = (col(s"f.$c"), col(s"h.$c"))
    def added(c: String) = {
      val (a, b) = both(c)
      (coalesce(a, lit(0L)) + coalesce(b, lit(0L))).as(c)
    }
    val (fu, hu) = both("users")
    val emptyUsers = array().cast("array<string>")
    f.join(h, col("f.pattern_id") === col("h.pattern_id"), "full_outer")
      .select(
        coalesce(col("f.pattern_id"), col("h.pattern_id")).as("pattern_id"),
        least(col("f.sql_pattern"), col("h.sql_pattern")).as("sql_pattern"),
        added("frequency"),
        added("total_duration_ms"),
        least(col("f.first_seen"), col("h.first_seen")).as("first_seen"),
        greatest(col("f.last_seen"), col("h.last_seen")).as("last_seen"),
        sort_array(array_distinct(concat(
          coalesce(fu, emptyUsers), coalesce(hu, emptyUsers)))).as("users"),
        added("memory_usage"),
        added("total_read_rows"),
        added("total_read_bytes"))
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
  }
}
