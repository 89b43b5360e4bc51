package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-7 postmortem guard: a crashed query must surface in the bench
  * artifact's `failed` map and stay OUT of `total`/`queries` — 35 broken
  * queries once "ran" in 0.05-0.08 s each and improved the headline
  * number. The lookup is injected so the breakage is deliberate and
  * hermetic. */
class BenchFailureSpec extends SparkSpec {

  test("a crashing query lands in failed, not in total/queries") {
    val lookup: String => (SparkSession, String) => DataFrame = {
      case "q_ok" => (s, _) => s.range(10).toDF("id")
      case "q_boom" => (_, _) =>
        throw new RuntimeException("deliberate \"boom\"\nsecond line is dropped")
    }
    val section = Bench.sectionJson(Bench.timeQueries(
      spark, "unused", Seq("q_ok", "q_boom"), iters = 1, lookup = lookup))

    assert(section.nOk == 1)
    assert(section.nFailed == 1)
    // failed carries the name + first error line, JSON-escaped
    assert(section.json.contains(""""n_failed":1"""))
    assert(section.json.contains(""""failed":{"q_boom":"""))
    assert(section.json.contains("deliberate \\\"boom\\\""))
    assert(!section.json.contains("second line"))
    // the numeric maps only carry the succeeded query
    val queriesObj = section.json.split("\"queries\":")(1).split(",\"queries_min\"")(0)
    assert(queriesObj.contains("q_ok"))
    assert(!queriesObj.contains("q_boom"))
    // total is q_ok's median alone — strictly positive, and identical to
    // the single entry in `queries`
    val okMedian = queriesObj.split("q_ok\":")(1).stripSuffix("}").toDouble
    assert(math.abs(section.total - okMedian) < 1e-9)
  }

  test("a clean section reports an empty failed map") {
    val lookup: String => (SparkSession, String) => DataFrame = {
      case "q_ok" => (s, _) => s.range(10).toDF("id")
    }
    val section = Bench.sectionJson(Bench.timeQueries(
      spark, "unused", Seq("q_ok"), iters = 1, lookup = lookup))
    assert(section.nFailed == 0)
    assert(section.json.contains(""""n_failed":0,"failed":{}"""))
  }
}
