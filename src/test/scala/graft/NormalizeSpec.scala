package graft

import graft.functions.Normalize
import org.apache.spark.sql.functions._

/** P2/U1: normalization spec is PINNED — golden strings and golden md5
  * fingerprints, because pattern identity must stay stable across runs and
  * Spark versions (SURVEY.md §7.4 #2). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("q").select(Normalize.normalizeQuery(col("q"))).head().getString(0)

  private def fp(s: String): String =
    Seq(s).toDF("q").select(Normalize.fingerprint(col("q"))).head().getString(0)

  test("lowercases, strips literals, collapses numbers and whitespace") {
    assert(norm("SELECT  *   FROM T WHERE a = 42") == "select * from t where a = n")
    assert(norm("SELECT * FROM t WHERE s = 'secret123'") == "select * from t where s = ?")
    assert(norm("select 1,2,  3") == "select n,n, n")
  }

  test("string literals collapse before number collapse (digits inside strings vanish)") {
    assert(norm("WHERE x = '99 bottles' AND y = 99") == "where x = ? and y = n")
  }

  test("identifiers containing digits survive (word-boundary anchored)") {
    assert(norm("SELECT c1 FROM t2") == "select c1 from t2")
  }

  test("golden fingerprints are stable") {
    // Pinned 2026-08: if these change, pattern identity breaks (A6 enrich).
    assert(fp("SELECT * FROM t WHERE a = 42") == fp("select * from T where A = 7"))
    assert(fp("SELECT * FROM t WHERE s = 'x'") == fp("SELECT * FROM t WHERE s = 'yyy'"))
    assert(fp("SELECT a FROM t") != fp("SELECT b FROM t"))
    val golden = fp("SELECT * FROM t WHERE a = 42")
    assert(golden == "13e04e797bab9b1baee09bc0a0a17a96", s"fingerprint drifted: $golden")
  }

  test("normalization equals the DuckDB twin by construction (same regexes)") {
    // The builder-side guarantee: duckdbNormalizeSql is built from the SAME
    // constants; here we just pin the generated SQL's shape.
    val sql = Normalize.duckdbNormalizeSql("q")
    assert(sql.contains("'g'"))
    assert(sql.contains("lower(q)"))
  }
}
