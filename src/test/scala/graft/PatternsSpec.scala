package graft

import java.sql.Timestamp
import graft.functions.Normalize
import graft.model.QueryLog
import graft.operators.Patterns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** A1/A2 invariants (SURVEY.md §5 item 1): avg×freq == total,
  * first_seen ≤ last_seen, and merge = one-shot aggregate (the
  * associativity/commutativity the reference implements imperatively in
  * `models.py:113-154`). Property-style over seeded random corpora. */
class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private val queryPool = Seq("SELECT a FROM t1", "SELECT b FROM t2 WHERE x = 7",
    "INSERT INTO t3 VALUES ('s')", "SELECT a FROM t1 WHERE y = 42")

  private def randomLogs(seed: Int, n: Int): Seq[QueryLog] = {
    val rnd = new Random(seed)
    Seq.fill(n) {
      val t = rnd.nextLong(1000000L)
      val mem = rnd.nextLong(1 << 20)
      QueryLog(s"id${rnd.nextInt()}", queryPool(rnd.nextInt(queryPool.size)),
        "SELECT", Seq("alice", "bob", "carol")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + t), rnd.nextInt(5000).toDouble,
        mem / 2, mem, 1, 10, mem, "")
    }
  }

  private def logsDf(rows: Seq[QueryLog]): DataFrame =
    rows.toDF().withColumn("pattern_id", Normalize.fingerprint(col("query")))

  test("aggregate invariants hold across seeds") {
    for (seed <- 1 to 5) {
      val rows = randomLogs(seed, 60)
      val agg = Patterns.aggregate(logsDf(rows)).collect()
      agg.foreach { r =>
        val freq = r.getAs[Long]("frequency")
        val total = r.getAs[Double]("total_duration_ms")
        val avg = r.getAs[Double]("avg_duration_ms")
        assert(math.abs(avg * freq - total) < 1e-6)
        assert(!r.getAs[Timestamp]("first_seen").after(r.getAs[Timestamp]("last_seen")))
      }
      assert(agg.map(_.getAs[Long]("frequency")).sum == rows.size)
    }
  }

  test("merge of split halves equals one-shot aggregate (A2/A6)") {
    for (seed <- 10 to 14) {
      val df = logsDf(randomLogs(seed, 80))
      val merged = Patterns.merge(
        Patterns.aggregate(df.filter(col("memory_usage") % 2 === 0)),
        Patterns.aggregate(df.filter(col("memory_usage") % 2 === 1)))
      val oneShot = Patterns.aggregate(df)
      val cols = Seq("pattern_id", "frequency", "first_seen", "last_seen",
        "users", "memory_usage", "total_read_rows", "total_read_bytes")
      val m = merged.select(cols.map(col): _*).orderBy("pattern_id").collect().toSeq
      val o = oneShot.select(cols.map(col): _*).orderBy("pattern_id").collect().toSeq
      assert(m == o)
    }
  }

  test("salted two-phase aggregate equals plain aggregate") {
    val df = logsDf(randomLogs(7, 100))
    val cols = Seq("pattern_id", "sql_pattern", "frequency", "total_duration_ms",
      "first_seen", "last_seen", "users", "memory_usage",
      "total_read_rows", "total_read_bytes")
    val plain = Patterns.aggregate(df).select(cols.map(col): _*)
      .orderBy("pattern_id").collect().toSeq
    val salted = Patterns.aggregateSalted(df, saltBuckets = 7).select(cols.map(col): _*)
      .orderBy("pattern_id").collect().toSeq
    assert(salted == plain)
  }

  test("merge is commutative") {
    val df = logsDf(randomLogs(42, 50))
    val a = Patterns.aggregate(df.filter(col("memory_usage") % 3 === 0))
    val b = Patterns.aggregate(df.filter(col("memory_usage") % 3 =!= 0))
    val ab = Patterns.merge(a, b).orderBy("pattern_id").collect().toSeq
    val ba = Patterns.merge(b, a).orderBy("pattern_id").collect().toSeq
    assert(ab == ba)
  }

  test("having filters by frequency and avg duration (F7/F8)") {
    val rows = Seq.tabulate(10)(i => QueryLog(s"q$i",
      if (i < 7) "SELECT a FROM t1" else "SELECT b FROM t2", "SELECT", "u",
      new Timestamp(1700000000000L), if (i < 7) 10.0 else 5000.0, 0, 0, 0, 0, 0, ""))
    val agg = Patterns.aggregate(logsDf(rows))
    assert(Patterns.having(agg, minFrequency = 5).count() == 1)
    assert(Patterns.having(agg, minFrequency = 1, minAvgDurationMs = 1000).count() == 1)
    assert(Patterns.having(agg, minFrequency = 1).count() == 2)
  }

  test("complexity score formula (models.py:156-165)") {
    val df = Seq((2000.0, 50L, 10L)).toDF("avg", "freq", "ntab")
      .select(Patterns.complexityScore(col("avg"), col("freq"), col("ntab")).as("c"))
    // duration capped at 1.0 → 0.4; freq 50/100 → 0.2; tables capped → 0.2
    assert(math.abs(df.head().getDouble(0) - 0.8) < 1e-12)
  }
}
