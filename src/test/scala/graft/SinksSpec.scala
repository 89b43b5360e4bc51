package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet: hive layout, one file per partition, pruning on read") {
    val docs = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"),
      (4L, "delta", "de"), (5L, "epsilon", "fr")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("sink_part").toString
    Sinks.partitionedParquet(docs, dir, Seq("lang"), sortCols = Seq("doc_id"))

    val root = new java.io.File(dir)
    val partDirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(partDirs.toSeq == Seq("lang=de", "lang=en", "lang=fr"))
    // repartition-by-partition-col ⇒ each directory written by ONE task:
    // exactly one data file per partition, not tasks x partitions slivers
    partDirs.foreach { d =>
      val files = new java.io.File(root, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d: ${files.length} files")
    }

    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    val filtered = back.filter(col("lang") === "en")
    assert(filtered.count() == 2)
    // the lang predicate must be answered by partition listing, not a scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
  }

  test("bucketed tables: same-key same-count join plans with ZERO exchanges") {
    val left = (1 to 100).map(i => (i.toLong, s"text$i")).toDF("doc_id", "text")
    val right = (1 to 100).map(i => (i.toLong, i % 7)).toDF("doc_id", "score")
    Sinks.bucketedTable(left, "b_left", "doc_id", 4, sortCols = Seq("doc_id"))
    Sinks.bucketedTable(right, "b_right", "doc_id", 4, sortCols = Seq("doc_id"))
    // force the sort-merge path (broadcast would trivially avoid the
    // exchange and prove nothing about the bucketing layout)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_left").join(spark.table("b_right"), "doc_id")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
