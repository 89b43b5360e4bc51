package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md §3).
  *
  * Mirrors the reference's source layer (`utils/data_acquisition.py:120-141`)
  * re-expressed as plain parquet scans: Catalyst handles projection pruning and
  * predicate pushdown, replacing the reference's hand-built WHERE strings and
  * its O(n²) LIMIT/OFFSET pagination loop (`utils/data_acquisition.py:145-178`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS,false), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw
    * longs, then truncate to microseconds — the engine's native timestamp
    * resolution. DuckDB (the oracle) floors identically when asked for
    * epoch_ms, so comparisons stay exact.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case n =>
      spark.read.parquet(s"$dir/$n.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
}
