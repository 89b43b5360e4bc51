package graft

import graft.dbt.DbtLoader
import org.scalatest.funsuite.AnyFunSuite

class DbtLoaderSpec extends AnyFunSuite {
  private def fixture(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  lazy val proj = DbtLoader.load(fixture("dbt_project"))

  test("file-walk path loads all models") {
    assert(proj.models.keySet ==
      Set("stg_orders", "stg_customers", "fct_revenue", "int_secrets", "rpt_daily"))
  }

  test("config block overrides materialization and schema (dbt_mapper.py:236-243)") {
    assert(proj.models("stg_orders").materialized == "table")
    assert(proj.models("fct_revenue").materialized == "incremental")
    assert(proj.models("fct_revenue").schema == "analytics")
    assert(proj.models("stg_customers").materialized == "view") // project default
  }

  test("directory-based schema suffixes (dbt_mapper.py:120-143)") {
    assert(proj.models("stg_orders").schema == "acme")      // _dbt stripped
    assert(proj.models("int_secrets").schema == "acme_private")
    assert(proj.models("rpt_daily").schema == "acme_reports")
  }

  test("sources resolve identifier/schema overrides (dbt_mapper.py:94-118)") {
    assert(proj.sourceRefs("raw.orders") == "landing.orders_raw")
    assert(proj.sourceRefs("raw.customers") == "landing.customers")
  }

  test("dependency edges from ref()/source() (dbt_analyzer.py:202-230)") {
    val deps = proj.models("fct_revenue").dependsOn
    assert(deps == Set("stg_orders", "stg_customers"))
    assert(proj.models("stg_orders").dependsOn == Set("raw.orders"))
    assert(proj.edges.contains("rpt_daily" -> "fct_revenue"))
  }

  test("3-tier lookup precedence (dbt_mapper.py:263-300)") {
    assert(proj.modelFor("acme.stg_orders").contains("stg_orders"))   // exact
    assert(proj.modelFor("STG_ORDERS").contains("stg_orders"))        // bare, case-insensitive
    assert(proj.modelFor("db.acme.stg_orders").contains("stg_orders")) // schema.table from 3 parts
    assert(proj.modelFor("unknown.table").isEmpty)
  }

  test("manifest path wins when target/manifest.json exists (dbt_mapper.py:53-58)") {
    val m = DbtLoader.load(fixture("dbt_project_manifest"))
    assert(m.models.keySet == Set("m_one", "m_two")) // seed filtered out
    assert(m.models("m_one").materialized == "table")
    assert(m.models("m_one").schema == "gold")       // node config override
    assert(m.models("m_two").schema == "core")       // project default
    assert(m.models("m_one").dependsOn == Set("m_two")) // deps still from files
    assert(m.models("m_two").dependsOn == Set("ext.tbl"))
  }
}
