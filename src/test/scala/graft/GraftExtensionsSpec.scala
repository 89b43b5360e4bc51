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
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
