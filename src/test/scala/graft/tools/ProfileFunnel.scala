package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: funnel cost with vs without the pre-flight budget. */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    val dir = "/root/testdata/sf0.1"
    def corpus = {
      val d = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      val planted = d.select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(Text.tokens(col("text")), lit(1),
          greatest(size(Text.tokens(col("text"))) - 1, lit(1))), " ").as("text"),
        col("lang"))
      d.unionByName(planted)
    }
    def pairsOf(uniq: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.jaccardNearDups(uniq, "doc_id", "text",
        shingleN = 5, dfMax = 20, minJaccard = 0.5).select("doc_a", "doc_b")
    def run(budget: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.CorpusReport.funnelWithNearDup(corpus, "doc_id", "text",
          "lang", pairsOf,
          maxCandidatePairs = if (budget) Some(50000000L) else None,
          candidateVolume = if (budget) Some(u => graft.operators.Dedup
            .candidateVolumeEstimate(u, "doc_id", "text", 5, 20)) else None)
        .orderBy(col("stage_idx"))
        .write.format("noop").mode("overwrite").save()
      graft.operators.Caches.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }
    run(budget = false); run(budget = true) // warm codegen both shapes
    val noB = (1 to 3).map(_ => run(budget = false)).min
    val withB = (1 to 3).map(_ => run(budget = true)).min
    println(f"FUNNEL no_budget=$noB%.2f with_budget=$withB%.2f delta=${withB - noB}%.2f")
    spark.stop()
  }
}
