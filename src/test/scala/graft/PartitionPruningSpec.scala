package graft

import graft.operators.Filters
import org.apache.spark.sql.functions._

/** Evidence for the F1 scale claim: on a date-partitioned log layout the
  * time-range predicate prunes partitions at planning time — the scan
  * never lists the out-of-range directories. */
class PartitionPruningSpec extends SparkSpec {

  test("time-range filter prunes date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString + "/events"
    graft.sources.Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val logs = spark.read.parquet(dir)
    val pruned = logs.filter(
      Filters.timeRange(col("ts"),
        lit(java.sql.Timestamp.valueOf("2024-01-29 00:00:00")), 2) &&
        col("event_date") >= "2024-01-27")
    val scan = pruned.queryExecution.executedPlan.toString

    // the partition filter must appear in the scan node...
    assert(scan.contains("PartitionFilters"), scan.take(500))
    assert(scan.contains("event_date"), scan.take(500))
    // ...and actually cut the partitions read
    val allParts = logs.select("event_date").distinct().count()
    val readParts = pruned.select("event_date").distinct().count()
    assert(readParts < allParts && readParts >= 2)
    // correctness unchanged vs unpartitioned source
    val expected = graft.sources.Tables.events(spark, sf0001)
      .filter(Filters.timeRange(col("ts"),
        lit(java.sql.Timestamp.valueOf("2024-01-29 00:00:00")), 2) &&
        to_date(col("ts")) >= "2024-01-27")
      .count()
    assert(pruned.count() == expected)
  }
}
