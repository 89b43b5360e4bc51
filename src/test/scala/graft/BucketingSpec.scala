package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Evidence for the co-located-join scale claim: bucketing both join
  * sides on the key removes the join Exchanges entirely — at 100 TB this
  * is the difference between re-shuffling the fact table per query and
  * reading it pre-partitioned. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without an Exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory persists — clear the locations too
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      val p = new java.io.File(s"spark-warehouse/$t")
      if (p.exists()) {
        import scala.reflect.io.Directory
        new Directory(p).deleteRecursively()
      }
    }
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    // force a non-broadcast join so the shuffle question is real
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan.take(1500))
    // and it is still correct
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
  }
}
