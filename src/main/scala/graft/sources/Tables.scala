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

  /** The driver fixtures are SINGLE-ROW-GROUP parquet files, and Spark
    * cannot split a parquet read below row-group granularity — so a plain
    * scan yields ONE populated partition and every per-row pass (window
    * hashing, quality signals, fingerprints, regex scrubbing) serializes
    * on one core while the other 31 idle. A real 100 TB table carries
    * thousands of row groups, which is why this spread is CONDITIONAL: it
    * only fires when the scan has fewer splits than half the cores, so on
    * any realistically laid-out input it inserts nothing. At fixture
    * scale the round-robin exchange moves <11 MB once. Filters and column
    * pruning push through Repartition (PushPredicateThroughNonJoin /
    * ColumnPruning), so PushedFilters/ReadSchema at the scan are
    * unaffected, and an explicit repartition(n) is exempt from AQE
    * coalescing (REPARTITION_BY_NUM origin), so the spread can't be
    * silently undone on tiny data. */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df else df.repartition(target)
  }

  /** events.ts has shipped with different parquet physical types across
    * fixture generations: TIMESTAMP(NANOS,false) — which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]) unless nanosAsLong
    * maps it to BIGINT — and TIMESTAMP(MICROS), which reads natively as
    * TIMESTAMP_NTZ (or TIMESTAMP when adjusted to UTC). A real deployment
    * hits the same drift the first time a log table's timestamp resolution
    * changes (the reference adapts via a DESCRIBE probe,
    * `utils/data_acquisition.py:250-293`). Normalize whatever arrived to
    * session-zoned TimestampType at microsecond resolution; sessions run
    * UTC, so the NTZ cast is value-identical and DuckDB's epoch_ms agrees
    * on every path. Works on batch AND streaming frames (type dispatch is
    * on the static schema, not the data). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanosAsLong: raw INT64 nanos
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // The NTZ→TIMESTAMP cast reinterprets the wall-clock value in the
        // SESSION zone: value-identical only under UTC. Every repo entry
        // point sets UTC, but this is public library surface — fail by
        // name on a misconfigured session instead of silently shifting
        // every event timestamp by the zone offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        // Accept every spelling of UTC ("Etc/UTC", "GMT", "+00:00", "Z",
        // ...) by normalizing through ZoneId and comparing the actual
        // rules — string equality rejected value-identical configs.
        val isUtc =
          try {
            val rules =
              java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).getRules
            rules.isFixedOffset &&
              rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
          } catch { case _: java.time.DateTimeException => false }
        require(isUtc,
          s"normalizeEventTs: session timeZone is '$tz' but the NTZ→TIMESTAMP " +
            "cast is value-identical only under UTC — set " +
            "spark.sql.session.timeZone=UTC (all graft entry points do)")
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other; expected INT64 nanos, TIMESTAMP_NTZ or TIMESTAMP")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // Harmless when ts is already MICROS; required to read a NANOS fixture.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spread(spark, normalizeEventTs(spark.read.parquet(s"$dir/events.parquet")))
    case n =>
      spread(spark, spark.read.parquet(s"$dir/$n.parquet"))
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
