package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source seam for query-log acquisition — the engine-side analogue of the
  * reference's `ClickHouseDataAcquisition` (`utils/data_acquisition.py:24-45`).
  *
  * The reference holds a single socket to one warehouse and pages results
  * through it with LIMIT/OFFSET batches (`data_acquisition.py:145-178`) —
  * O(n²) server work and a single-threaded client. Here a source only has
  * to produce a DataFrame; everything downstream ([[graft.Analyze]]) is
  * source-agnostic, and scale-out comes from the source's own partitioning:
  *
  *  - [[ParquetLogSource]]: the primary path — splittable files, predicate
  *    pushdown and column pruning for free.
  *  - [[JdbcLogSource]]: external-warehouse path. Spark's JDBC relation
  *    pushes filters into the remote WHERE clause (visible as
  *    `PushedFilters` in the plan) and replaces LIMIT/OFFSET paging with
  *    `partitionColumn` range predicates — N executors each fetch one
  *    non-overlapping slice concurrently, which is how a 1000-executor
  *    cluster drains a warehouse table without a driver-side loop.
  */
trait LogSource {
  def load(spark: SparkSession): DataFrame
}

/** Parquet directory/file source (TESTDATA layout). */
final case class ParquetLogSource(path: String) extends LogSource {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** JDBC source with range-partitioned parallel fetch.
  *
  * @param url        JDBC url (e.g. `jdbc:derby:memory:db` in tests; a
  *                   warehouse url in production)
  * @param table      table name or `(subquery) alias`
  * @param partition  optional (column, lowerBound, upperBound, numPartitions):
  *                   splits the fetch into numPartitions range slices — the
  *                   distributed replacement for the reference's
  *                   LIMIT/OFFSET batching (`data_acquisition.py:145-178`)
  * @param options    extra driver options (driver class, fetchsize — the
  *                   reference's client `settings`, `data_acquisition.py:27-39`)
  */
final case class JdbcLogSource(
    url: String,
    table: String,
    partition: Option[(String, Long, Long, Int)] = None,
    options: Map[String, String] = Map.empty) extends LogSource {
  def load(spark: SparkSession): DataFrame = {
    // ClickHouse urls get the graft dialect (type algebra + quoting)
    // without a manual registration step
    if (ClickHouseDialect.canHandle(url)) ClickHouseDialect.register()
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val partitioned = partition.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }
    options.foldLeft(partitioned) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}
