package graft

import graft.operators.Paging
import graft.operators.Paging.Keyset
import org.apache.spark.sql.functions._

class PagingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 100L).map(i => (i, (i * 37) % 50, s"row$i"))
    .toDF("id", "score", "payload")

  test("keyset page equals the corresponding offset page") {
    val order = Seq(col("score").desc, col("id").asc)
    val page2 = Paging.page(rows, order, 10, 2)
      .select("id", "score").as[(Long, Long)].collect().toSeq
    // last row of page 1 is the keyset boundary for page 2
    val Seq((lastId, lastScore)) = Paging.page(rows, order, 10, 1)
      .select("id", "score").as[(Long, Long)].collect().toSeq.takeRight(1)
    val keyset = Paging.after(rows, Seq(
      Keyset(col("score"), lit(lastScore), desc = true),
      Keyset(col("id"), lit(lastId))), 10)
      .select("id", "score").as[(Long, Long)].collect().toSeq
    assert(keyset == page2)
  }

  test("afterPredicate is a strict lexicographic order") {
    val pred = Paging.afterPredicate(Seq(
      Keyset(col("score"), lit(10L), desc = true), Keyset(col("id"), lit(5L))))
    val kept = rows.filter(pred).select("score", "id").as[(Long, Long)]
      .collect().toSet
    kept.foreach { case (s, i) => assert(s < 10L || (s == 10L && i > 5L)) }
    val dropped = rows.filter(!pred).select("score", "id").as[(Long, Long)]
      .collect().toSet
    dropped.foreach { case (s, i) => assert(s > 10L || (s == 10L && i <= 5L)) }
  }

  test("keyset plan is TakeOrdered with no window, offset plan is not") {
    val keysetPlan = Paging.after(rows, Seq(
      Keyset(col("score"), lit(10L), desc = true), Keyset(col("id"), lit(5L))), 10)
      .queryExecution.executedPlan.toString
    assert(keysetPlan.contains("TakeOrderedAndProject"), keysetPlan)
    assert(!keysetPlan.contains("Window"), keysetPlan)
    val offsetPlan = Paging.page(rows, Seq(col("id").asc), 10, 2)
      .queryExecution.executedPlan.toString
    assert(offsetPlan.contains("Window"), offsetPlan) // the documented tradeoff
  }
}
