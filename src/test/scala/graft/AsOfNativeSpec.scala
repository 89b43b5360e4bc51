package graft

import graft.operators.AsOf
import graft.plans.AsOfNative
import org.apache.spark.sql.functions._
import scala.util.Random

/** The custom LogicalPlan/Strategy/SparkPlan as-of join: semantics
  * identical to the composed form (itself oracle-checked against DuckDB's
  * native ASOF JOIN via q_asof_join), plus physical-plan properties the
  * composition can't offer. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, nLeft: Int, nRight: Int, nKeys: Int) = {
    val rnd = new Random(seed)
    val left = (0 until nLeft).map(i =>
      (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "k", "ts")
    // unique (k, ts) on the right, per the operator contract
    val right = rnd.shuffle((0 until nRight).map(i =>
      (rnd.nextInt(nKeys).toLong, i.toLong * 3 % 997, rnd.nextInt(100000).toLong)))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "ts", "payload")
    (left, right)
  }

  test("native as-of == composed as-of on randomized corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val (left, right) = corpus(seed, nLeft = 500, nRight = 300, nKeys = 13)
      val native = AsOfNative.join(left, right, Seq("k"), "ts", "ts",
        Seq("payload", "ts"), prefix = "r_")
        .select("event_id", "k", "ts", "r_payload", "r_ts")
      val composed = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts",
        Seq("payload", "ts"), prefix = "r_")
        .select("event_id", "k", "ts", "r_payload", "r_ts")
      val n = native.orderBy("event_id").collect().toSeq
      val c = composed.orderBy("event_id").collect().toSeq
      assert(n == c, s"seed=$seed differs")
      assert(n.exists(_.isNullAt(3)) || seed != 1) // some unmatched lefts exist
    }
  }

  test("unmatched left rows get null payload; empty right joins all-null") {
    val left = Seq((1L, 5L, 10L)).toDF("event_id", "k", "ts")
    val right = Seq((6L, 1L, 99L)).toDF("k", "ts", "payload")
    val out = AsOfNative.join(left, right, Seq("k"), "ts", "ts", Seq("payload")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
    val empty = AsOfNative.join(left, right.limit(0), Seq("k"), "ts", "ts",
      Seq("payload")).collect()
    assert(empty.length == 1 && empty.head.isNullAt(3))
  }

  test("plans as AsOfJoinExec; downstream per-key agg reuses the exchange") {
    val (left, right) = corpus(3, 200, 100, 7)
    val joined = AsOfNative.join(left, right, Seq("k"), "ts", "ts", Seq("payload"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(600)) // SparkPlan nodeName strips "Exec"
    // the join itself needs exactly two hash exchanges (one per child)...
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    // ...and a per-key aggregate on top adds NO new exchange: the exec
    // advertises the left child's hash partitioning
    val agged = joined.groupBy("k").agg(count(lit(1))).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(agged).size == 2, agged)
  }

  test("ties on the timestamp match (<= semantics), latest right wins") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 150L)).toDF("event_id", "k", "ts")
    val right = Seq((1L, 100L, 7L), (1L, 120L, 9L)).toDF("k", "ts", "payload")
    val out = AsOfNative.join(left, right, Seq("k"), "ts", "ts", Seq("payload"))
      .orderBy("event_id").collect()
    assert(out(0).getLong(3) == 7L)  // exact-tie row matches
    assert(out(1).getLong(3) == 9L)  // latest at-or-before 150
  }
}
