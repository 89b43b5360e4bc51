package graft

import graft.operators.Filters
import graft.operators.Filters.PatternCriteria
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val patterns = Seq(
    ("p1", 10L, 50.0, Seq("db.orders"), Seq("stg_orders")),
    ("p2", 3L, 2000.0, Seq("db.events"), Seq.empty[String]),
    ("p3", 100L, 900.0, Seq("db.orders", "db.events"), Seq("fct_revenue")))
    .toDF("pattern_id", "frequency", "avg_duration_ms", "tables_accessed", "dbt_models_used")

  test("criteria compose as a conjunction (filtering.py:6-46)") {
    def ids(c: PatternCriteria): Set[String] =
      Filters.applyCriteria(patterns, c).select("pattern_id")
        .collect().map(_.getString(0)).toSet
    assert(ids(PatternCriteria()) == Set("p1", "p2", "p3"))
    assert(ids(PatternCriteria(patternIds = Seq("p1", "p3"))) == Set("p1", "p3"))
    assert(ids(PatternCriteria(minAvgDurationMs = Some(800.0))) == Set("p2", "p3"))
    assert(ids(PatternCriteria(minFrequency = Some(5L))) == Set("p1", "p3"))
    assert(ids(PatternCriteria(selectTables = Seq("db.events"))) == Set("p2", "p3"))
    assert(ids(PatternCriteria(selectModels = Seq("stg_orders"))) == Set("p1"))
    assert(ids(PatternCriteria(minFrequency = Some(5L),
      selectTables = Seq("db.events"))) == Set("p3"))
  }

  test("system-table classifier keeps mixed patterns (F11)") {
    val df = Seq(
      Seq("system.query_log"), Seq("system.parts", "db.real"), Seq("db.t"))
      .toDF("tables")
    val kept = df.filter(Filters.touchesUserTables(col("tables"))).count()
    assert(kept == 2)
  }
}
