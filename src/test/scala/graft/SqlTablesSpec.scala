package graft

import graft.functions.SqlTables
import org.scalatest.funsuite.AnyFunSuite

/** U2 parity corpus (reference `utils/sql_parser.py`; cases from
  * FIXTURES.md §1). */
class SqlTablesSpec extends AnyFunSuite {

  test("plain FROM") {
    assert(SqlTables.extractTables("SELECT * FROM orders") == Set("orders"))
  }

  test("joins collect all targets") {
    val sql = "SELECT * FROM orders o JOIN customer c ON o.k = c.k LEFT JOIN nation n ON 1=1"
    assert(SqlTables.extractTables(sql) == Set("orders", "customer", "nation"))
  }

  test("schema.table keeps last two parts, lowercased") {
    assert(SqlTables.extractTables("SELECT 1 FROM Warehouse.Analytics.Events") ==
      Set("analytics.events"))
    assert(SqlTables.extractTables("select 1 from db.Schema.T") == Set("schema.t"))
  }

  test("quotes and backticks stripped") {
    assert(SqlTables.extractTables("""SELECT 1 FROM `db`.`tbl`""") == Set("db.tbl"))
    assert(SqlTables.extractTables("""SELECT 1 FROM "sch"."tab"""") == Set("sch.tab"))
  }

  test("CTE names excluded (sql_parser.py:91-110)") {
    val sql =
      """WITH recent AS (SELECT * FROM logs WHERE d > 1),
        |agg AS (SELECT k, count(*) FROM recent GROUP BY k)
        |SELECT * FROM agg JOIN dims ON agg.k = dims.k""".stripMargin
    assert(SqlTables.extractTables(sql) == Set("logs", "dims"))
  }

  test("dbt ref()/source() (sql_parser.py:71-89)") {
    val sql = "SELECT * FROM {{ ref('stg_orders') }} JOIN {{ source('raw', 'events') }} USING (k)"
    assert(SqlTables.extractTables(sql) == Set("stg_orders", "raw.events"))
  }

  test("non-DML statements yield nothing (sql_parser.py:176-178)") {
    assert(SqlTables.extractTables("SHOW TABLES FROM db") == Set.empty)
    assert(SqlTables.extractTables("CREATE DATABASE x") == Set.empty)
  }

  test("null/garbage → empty set, no throw (sql_parser.py:184-187)") {
    assert(SqlTables.extractTables(null) == Set.empty)
    assert(SqlTables.extractTables("") == Set.empty)
    assert(SqlTables.extractTables("?? not sql at all ¯\\_(ツ)_/¯") == Set.empty)
  }

  test("subquery after FROM is not a table ref; its contents are scanned") {
    val sql = "SELECT * FROM (SELECT * FROM inner_t) x"
    assert(SqlTables.extractTables(sql) == Set("inner_t"))
  }

  test("INSERT targets") {
    assert(SqlTables.extractTables("INSERT INTO t SELECT * FROM src") == Set("src"))
  }
}
