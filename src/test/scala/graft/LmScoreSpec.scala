package graft

import graft.functions.{LmScore, Text}
import org.apache.spark.sql.functions._

/** The hashed word-bigram LM quality score (LmScore scaladoc): it must
  * separate fluent from shuffled text, honor the no-bigram null
  * contract, load the pinned fixture densely, and stay map-only. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def scored(docs: Seq[(Long, String)]) = {
    val toks = docs.toDF("doc_id", "text").select(
      col("doc_id"), Text.tokens(lower(col("text"))).as("toks"))
    toks.select(col("doc_id"),
        greatest(size(col("toks")) - 1, lit(0)).cast("long").as("n_bigrams"),
        LmScore.bigramBuckets(col("toks")).as("bb"))
      .select(col("doc_id"), col("n_bigrams"),
        LmScore.nllCenti(col("bb")).as("nll_c"))
      .withColumn("avg", LmScore.avgNll(col("nll_c"), col("n_bigrams")))
  }

  test("fluent text scores below the shuffled twin and below the keep threshold") {
    // the fluent doc reuses phrases from the generator's authored seed
    // (seen bigrams); the twin is the SAME tokens reversed — same
    // unigram content, near-zero seen-bigram overlap, ~backoff average
    val fluent = "the children ran to school with their bags on their backs"
    val twin = fluent.split(" ").reverse.mkString(" ")
    val rows = scored(Seq((1L, fluent), (2L, twin)))
      .orderBy("doc_id").collect()
    val (fluentAvg, twinAvg) = (rows(0).getDouble(3), rows(1).getDouble(3))
    assert(fluentAvg < twinAvg,
      s"fluent $fluentAvg must beat shuffled $twinAvg")
    assert(fluentAvg <= LmScore.DefaultMaxAvgNll,
      s"fluent doc over the default keep threshold: $fluentAvg")
    assert(twinAvg > LmScore.DefaultMaxAvgNll,
      s"shuffled doc under the default keep threshold: $twinAvg")
  }

  test("no bigrams (empty or single-token text) means null average, zero NLL") {
    val rows = scored(Seq((1L, ""), (2L, "lonely"), (3L, "two tokens")))
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == 0L && rows(0).isNullAt(3))
    assert(rows(1).getLong(1) == 0L && rows(1).isNullAt(3))
    assert(rows(0).getLong(2) == 0L, "no bigrams must charge zero NLL")
    assert(rows(2).getLong(1) == 1L && !rows(2).isNullAt(3))
  }

  test("weights load densely: unlisted buckets take the backoff value") {
    val table = LmScore.loadWeights()
    assert(table.length == LmScore.Buckets)
    // the backoff (zero-count) value dominates a 4096-bucket table built
    // from a few hundred seed bigrams, and every listed weight beats it
    // (counts only raise probability)
    val backoff = table.groupBy(identity).maxBy(_._2.length)._1
    assert(table.count(_ == backoff) > LmScore.Buckets / 2)
    assert(table.forall(_ >= backoff))
    assert(table.exists(_ > backoff), "fixture carries no seen bigrams")
  }

  test("an explicit GRAFT_LM_WEIGHTS pointing nowhere fails by name") {
    val e = intercept[IllegalArgumentException] {
      LmScore.resolveWeightsPath(Map("GRAFT_LM_WEIGHTS" -> "/no/such/file.tsv"))
    }
    assert(e.getMessage.contains("GRAFT_LM_WEIGHTS"))
  }

  test("scoring is map-only: no exchange in the executed plan") {
    val df = scored(Seq((1L, "the sun rose slowly over the quiet town")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
