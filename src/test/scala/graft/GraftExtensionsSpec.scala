package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions registers cosine_sim for plain SQL") {
    // The `spark.sql.extensions` CONFIG is only read when the SparkContext
    // itself is created (cluster-launch time in production); with the
    // JVM-shared test context we must use the programmatic equivalent,
    // builder().withExtensions — same injection path, same extension class.
    // Clear session slots so a new session is built over the same context;
    // never stop(); restore the previous sessions after.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql("SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) c")
        .head().getDouble(0)
      assert(r == 1.0)
      // the injected planner strategy plans AsOfJoin nodes on THIS session
      // without any experimental-strategies registration
      import spark.implicits._
      val l = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
      val rt = Seq((1L, 5L, 7L)).toDF("k", "ts", "payload")
      val out = graft.plans.AsOfNative.join(l, rt, Seq("k"), "ts", "ts", Seq("payload"))
      assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(out.head().getLong(3) == 7L)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
