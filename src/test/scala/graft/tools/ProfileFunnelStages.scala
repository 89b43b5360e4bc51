package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where do q_corpus_funnel_neardup's seconds go? Times each
  * internal stage of funnelWithNearDup in isolation (same frames, same
  * caches, materialized in the operator's own order). */
object ProfileFunnelStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Text
    import graft.operators.{Caches, Dedup, QualityFilter}
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val d = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      val planted = d.select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(Text.tokens(col("text")), lit(1),
          greatest(size(Text.tokens(col("text"))) - 1, lit(1))), " ").as("text"),
        col("lang"))
      val docs = d.unionByName(planted)
      val src = t("src_cache") {
        val s0 = Caches.tracked(docs.select(col("doc_id"), col("text"), col("lang")), "corpus")
        s0.count(); s0
      }
      val base = src.select(col("doc_id"), col("text").as("text"))
      val kept = t("gate") {
        val k = Caches.tracked(base.join(
          QualityFilter(src, "doc_id", "text", "lang")
            .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi"),
          "corpus")
        k.count(); k
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
        .orderBy(col("doc_id"))
      val uniq = t("window_dedup") {
        val u = Caches.tracked(kept.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn"), "corpus")
        u.count(); u
      }
      t("estimate") {
        Dedup.candidateVolumeEstimate(uniq, "doc_id", "text", 5, 20)
      }
      val pairs = t("pairs") {
        val p = Dedup.jaccardNearDups(uniq, "doc_id", "text",
          shingleN = 5, dfMax = 20, minJaccard = 0.5).select("doc_a", "doc_b")
        p.cache().count(); p
      }
      val keep = t("components_keep") {
        val k = Dedup.keepCanonical(uniq.select(col("doc_id")), "doc_id", pairs)
        k.cache().count(); k
      }
      t("stage_aggs") {
        def stage(df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)), sum(Text.tokenCount(col("text")))).collect()
        stage(base); stage(kept); stage(uniq)
        stage(uniq.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi"))
      }
      Caches.unpersistAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
