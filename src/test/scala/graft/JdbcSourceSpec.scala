package graft

import java.sql.DriverManager
import graft.sources.{JdbcLogSource, ParquetLogSource}
import org.apache.spark.sql.functions._

/** [[graft.sources.LogSource]] seam against a real JDBC database — embedded
  * in-memory Derby (shipped with Spark), so the pushdown and partitioned
  * fetch are verified end to end without network access. */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE query_log (
        |  query_id VARCHAR(32) NOT NULL,
        |  user_name VARCHAR(32),
        |  duration_ms DOUBLE,
        |  seq BIGINT)""".stripMargin)
    val ins = conn.prepareStatement("INSERT INTO query_log VALUES (?, ?, ?, ?)")
    (0 until 100).foreach { i =>
      ins.setString(1, s"q$i")
      ins.setString(2, if (i % 2 == 0) "alice" else "bob")
      ins.setDouble(3, i * 100.0)
      ins.setLong(4, i.toLong)
      ins.executeUpdate()
    }
    st.close(); ins.close(); conn.close()
  }

  private def source(partitioned: Boolean) = JdbcLogSource(url, "query_log",
    partition = if (partitioned) Some(("seq", 0L, 100L, 4)) else None)

  test("JDBC source reads through the seam") {
    seeded
    val df = source(partitioned = false).load(spark)
    assert(df.count() == 100)
    assert(df.columns.toSet == Set("QUERY_ID", "USER_NAME", "DURATION_MS", "SEQ"))
  }

  test("filters push into the remote WHERE clause (PushedFilters)") {
    seeded
    val df = source(partitioned = false).load(spark)
      .filter(col("DURATION_MS") > 5000.0 && col("USER_NAME") === "alice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan(DURATION_MS,5000.0)"), plan)
    assert(plan.contains("EqualTo(USER_"), plan) // plan strings elide long filter lists
    assert(df.count() == 24) // even i in 51..99
  }

  test("range partitioning fans the fetch out (replaces LIMIT/OFFSET paging)") {
    seeded
    val df = source(partitioned = true).load(spark)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // slices are disjoint and complete
    assert(df.select(countDistinct(col("SEQ"))).head().getLong(0) == 100)
  }

  test("parquet source loads through the same seam") {
    val df = ParquetLogSource(s"$sf0001/orders.parquet").load(spark)
    assert(df.count() > 0)
  }
}
