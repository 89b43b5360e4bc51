package graft

import graft.dbt.DbtLoader
import graft.operators.Mapping
import org.apache.spark.sql.functions._

class MappingSpec extends SparkSpec {
  import spark.implicits._

  lazy val proj = DbtLoader.load(resource("dbt_project"))
  lazy val lookup = Mapping.lookupDf(spark, proj)

  private def patternsDf(tables: Seq[String], id: String = "p1") =
    Seq((id, tables)).toDF("pattern_id", "tables_accessed")

  test("J1 tier precedence: exact beats bare beats schema.table") {
    val pats = patternsDf(Seq(
      "acme.stg_orders",        // exact (tier 1)
      "STG_CUSTOMERS",          // bare (tier 2)
      "db.analytics.fct_revenue", // 3-part → schema.table (tier 3)
      "mystery.unknown_tbl"))   // unmapped
    val got = Mapping.resolveTables(pats, lookup)
      .orderBy("tbl").collect()
      .map(r => r.getString(1) -> Option(r.getString(2))).toMap
    assert(got("acme.stg_orders").contains("stg_orders"))
    assert(got("STG_CUSTOMERS").contains("stg_customers"))
    assert(got("db.analytics.fct_revenue").contains("fct_revenue"))
    assert(got("mystery.unknown_tbl").isEmpty)
  }

  test("enrichWithModels adds model set and unmapped tables (SO4)") {
    val enriched = Mapping.enrichWithModels(
      patternsDf(Seq("stg_orders", "nowhere.t")), lookup).head()
    assert(enriched.getList[String](enriched.fieldIndex("dbt_models_used")).toArray.toSeq == Seq("stg_orders"))
    assert(enriched.getList[String](enriched.fieldIndex("unmapped_tables")).toArray.toSeq == Seq("nowhere.t"))
  }

  test("coverage counts used ∪ 1-hop parents vs universe (A7/J3/SO1)") {
    val enriched = Mapping.enrichWithModels(patternsDf(Seq("rpt_daily")), lookup)
    val cov = Mapping.coverage(enriched, Mapping.modelsDf(spark, proj),
      Mapping.edgesDf(spark, proj)).head()
    // rpt_daily used; 1-hop parent fct_revenue joins in; stg_* stay unused.
    assert(cov.getAs[Long]("n_total") == 5)
    assert(cov.getAs[Long]("n_used") == 2)
    assert(cov.getAs[Long]("n_unused") == 3)
    assert(cov.getAs[String]("unused_models") == "int_secrets,stg_customers,stg_orders")
    assert(math.abs(cov.getAs[Double]("pct_covered") - 40.0) < 1e-9)
  }

  test("parentChild rollup (J4)") {
    val pc = Mapping.parentChild(Mapping.modelsDf(spark, proj),
      Mapping.edgesDf(spark, proj))
      .filter(col("model") === "fct_revenue").head()
    assert(pc.getList[String](pc.fieldIndex("depends_on")).toArray.toSeq == Seq("stg_customers", "stg_orders"))
    assert(pc.getList[String](pc.fieldIndex("referenced_by")).toArray.toSeq == Seq("rpt_daily"))
  }
}
