package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: does tfidf's repeated tf subtree reuse its exchange under AQE? */
object TfidfPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1 to 500).map(i =>
      (i.toLong, s"some text body number ${i % 37} with several words $i"))
      .toDF("doc_id", "text")
    val df = graft.operators.Tfidf.topTerms(docs, "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println("REUSE_MARKERS reused=" +
      "ReusedExchange|ReusedQueryStage|ReusedSubquery".r.findAllIn(p).length +
      " shuffleStages=" + "ShuffleQueryStage".r.findAllIn(p).length +
      " exchanges=" + "Exchange hashpartitioning".r.findAllIn(p).length)
    println(p.linesIterator.filter(l =>
      l.contains("QueryStage") || l.contains("Exchange") || l.contains("Reused"))
      .mkString("\n"))
    spark.stop()
  }
}
