package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: what does the decorrelated Q20-shape plan look like? */
object Q20PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_tpch_q20")(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    spark.stop()
  }
}
