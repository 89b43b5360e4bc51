package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output side of the engine. The reference's only sinks are its SQLite
  * cache and a JSON export (`querysight.py:815-817`, covered by
  * [[graft.operators.PatternStore]] / `Cli export`); a corpus engine
  * additionally needs a LAYOUT-AWARE bulk sink, because at 100 TB the
  * write is where downstream read performance is decided.
  */
object Sinks {

  /** Make a managed table name safely (re)creatable even after a CRASH:
    * `saveAsTable` with `mode("overwrite")` replaces a table the CATALOG
    * knows about, but a run killed mid-write (SIGKILL during a bench, a
    * lost executor during CI) can leave the managed LOCATION on disk with
    * no catalog entry — and the next create then fails with
    * LOCATION_ALREADY_EXISTS, poisoning every later run in the same
    * warehouse (the r15 postmortem: one killed bench run broke the whole
    * test suite). This drops any catalog entry AND deletes the orphaned
    * managed directory, so every table-creating write in the engine is
    * idempotent against its own crashes. Only the CURRENT database's
    * managed location is touched — external/path-based tables are the
    * caller's layout, not ours. */
  def ensureWritableTable(spark: SparkSession, table: String): Unit = {
    // Unqualified, unquoted names only (r16 ADVICE): a 'db.tbl' string
    // would be backticked into ONE identifier in the DROP below while the
    // debris path derives from the CURRENT database — dropping one thing
    // and deleting another is exactly the inconsistency this helper
    // exists to prevent, so reject it outright.
    require(!table.contains(".") && !table.contains("`"),
      s"ensureWritableTable expects an unqualified table name, got '$table'")
    // DROP first: a LIVE managed table's directory (wherever the catalog
    // put it, including a custom LOCATION) is deleted by Spark's own drop
    // semantics; the manual delete below then only ever removes ORPHANED
    // debris at the default managed path — never a cataloged table's data.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val dbLoc = spark.catalog.getDatabase(spark.catalog.currentDatabase)
      .locationUri
    val loc = new org.apache.hadoop.fs.Path(dbLoc,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write-then-swap replacement (r16 ADVICE): the new data lands in a
    * STAGE table first, and only after that write SUCCEEDS is the old
    * table dropped and the stage renamed into place. Two failure modes
    * the old in-place overwrite had are gone:
    *
    *  - a failed write no longer destroys the previous table (the old
    *    drop-then-write deleted the target before one replacement row
    *    existed — any executor failure lost the index being replaced);
    *  - SELF-REFERENTIAL replaces work: `saveBm25Index(appendBm25Index(
    *    loadBm25Index(spark, p), batch), p)` onto the same prefix reads
    *    the live table while writing the stage — the lifecycle the
    *    append/delete APIs invite.
    *
    * The unprotected window shrinks from the whole write to the
    * drop+rename metadata swap; a crash inside THAT window leaves the
    * complete new table under `<table>__stage` (recoverable by hand),
    * and the next write clears it via [[ensureWritableTable]]. Rename
    * moves the managed directory with the catalog entry (bucketing spec
    * included), so bucketed layouts survive the swap — SinksSpec pins
    * the no-Exchange join on a swapped table. */
  private def stagedSwap(spark: SparkSession, table: String)
                        (write: String => Unit): Unit =
    replaceTables(spark, Seq(table -> write))

  /** MULTI-table staged replacement — the grouped form of [[stagedSwap]]
    * for table SETS whose replacement plans read each other's previous
    * versions (a BM25 index's termStats derive from a join against the
    * previous postings when appending): every write lands in its stage
    * table while ALL previous tables remain live, and only then do the
    * drop+rename swaps run. Swapping table-by-table instead broke the
    * append-then-save lifecycle mid-sequence: the second table's plan
    * pinned the FIRST table's already-replaced file listing
    * (FAILED_READ_FILE, measured in SinksSpec's self-referential test
    * before this form existed). The swaps themselves are metadata+rename
    * ops — no plan reads run inside the unprotected window.
    *
    * CRASH CONSISTENCY for the swap window (r17 ADVICE — the medium): a
    * crash BETWEEN swaps of a multi-table set would leave a MIXED
    * old/new set (new postings beside old termstats — silently wrong
    * scores, worse than a missing table). So for sets of ≥2 tables a
    * SWAP-COMMIT MARKER table (`<first>__swapcommit`, listing the
    * members) is created after every stage write has SUCCEEDED and
    * dropped after the last rename. The marker certifies "every stage is
    * a complete new table", which makes ROLL-FORWARD always correct:
    * [[recoverSwaps]] finishes the interrupted renames from the stages,
    * and the index loaders ([[graft.operators.Tfidf.loadBm25Index]],
    * [[graft.operators.Pq.loadServingIndex]]) call it before reading so
    * a mixed set is repaired — never served. Leftover stages WITHOUT a
    * marker mean the crash hit during a stage write: the old set is
    * still fully live (no swap ever started) and the stages are debris
    * the next write clears via [[ensureWritableTable]]. Single-table
    * replaces skip the marker — with one table there is no mixed state,
    * only the already-documented old-or-recoverable-stage window. */
  def replaceTables(spark: SparkSession,
                    writes: Seq[(String, String => Unit)]): Unit = {
    writes.foreach { case (table, write) =>
      val stage = table + "__stage"
      ensureWritableTable(spark, stage)
      write(stage)
    }
    val marker = if (writes.size < 2) None else Some(writes.head._1 + "__swapcommit")
    marker.foreach { m =>
      ensureWritableTable(spark, m)
      import spark.implicits._
      writes.map(_._1).toDF("member").repartition(1)
        .write.format("parquet").saveAsTable(m)
    }
    writes.foreach { case (table, _) =>
      ensureWritableTable(spark, table)
      spark.sql(s"ALTER TABLE `${table}__stage` RENAME TO `$table`")
    }
    marker.foreach(m => spark.sql(s"DROP TABLE IF EXISTS `$m`"))
  }

  /** Roll FORWARD a multi-table swap that crashed inside its rename
    * window (see [[replaceTables]]): if the set's swap-commit marker
    * exists, every member whose `__stage` table is still present gets
    * its rename finished (the marker certifies the stage is a complete
    * new table), then the marker is dropped. Idempotent — already-
    * swapped members have no stage and are skipped; a second recovery
    * call is a no-op. Returns true iff a repair ran. `tables` must be
    * the same member list, in the same order, as the original
    * [[replaceTables]] call (the loaders' table sets are fixed by their
    * save functions, so this is structural, not a convention to
    * remember). */
  def recoverSwaps(spark: SparkSession, tables: Seq[String]): Boolean = {
    if (tables.size < 2) return false
    val marker = tables.head + "__swapcommit"
    if (!spark.catalog.tableExists(marker)) return false
    tables.foreach { t =>
      if (spark.catalog.tableExists(s"${t}__stage")) {
        ensureWritableTable(spark, t)
        spark.sql(s"ALTER TABLE `${t}__stage` RENAME TO `$t`")
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS `$marker`")
    true
  }

  /** A plain-parquet stage writer for [[replaceTables]]. */
  def parquetWriter(df: DataFrame): String => Unit =
    stage => df.write.mode("overwrite").format("parquet").saveAsTable(stage)

  /** A bucketed stage writer for [[replaceTables]] — same layout contract
    * as [[bucketedTableOn]]. */
  def bucketedWriter(df: DataFrame, bucketCols: Seq[String], numBuckets: Int,
                     sortCols: Seq[String] = Nil): String => Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    stage => {
      val w = df.repartition(numBuckets, bucketCols.map(col): _*)
        .write.mode("overwrite")
      val b = w.bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      (if (sortCols.nonEmpty) b.sortBy(sortCols.head, sortCols.tail: _*)
       else b).format("parquet").saveAsTable(stage)
    }
  }

  /** Replace a managed parquet table, crash-debris-proof AND
    * failure-atomic (see [[stagedSwap]]): the overwrite every persistence
    * API in the engine routes through (BM25 stats, ANN centroid/codebook
    * tables, bench prebuilds) so no call site can hit the
    * orphaned-location failure [[ensureWritableTable]] exists for, and a
    * failed write leaves the previous table intact. */
  def replaceTable(df: DataFrame, table: String): Unit =
    stagedSwap(df.sparkSession, table)(parquetWriter(df))

  /** Hive-style partitioned parquet, laid out for downstream pruning:
    *
    *  - `partitionCols` become directory levels, so any later filter on
    *    them is answered by LISTING, not scanning (partition pruning);
    *    choose low-cardinality axes (lang, source, date) — a high-
    *    cardinality partition column melts the namenode/listing instead;
    *  - one `repartition(partitionCols)` shuffle co-locates each partition
    *    value, so every partition directory is written by ONE task instead
    *    of every task appending a sliver-file to every directory (the
    *    small-files explosion: tasks × partitions files otherwise);
    *  - `sortWithinPartitions(sortCols)` gives row-group locality on the
    *    secondary key, so parquet min/max stats prune row groups for
    *    range predicates on it;
    *  - `maxRecordsPerFile` caps file size so one hot partition value
    *    still splits into reader-parallel files.
    */
  def partitionedParquet(df: DataFrame, dir: String, partitionCols: Seq[String],
                         sortCols: Seq[String] = Nil,
                         maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** JSONL shard export — the corpus hand-off format trainers consume
    * (one JSON object per line, many shard files). `maxRecordsPerFile`
    * bounds shard size so downstream loaders parallelize; an optional
    * `repartition` count sets a shard-count floor without a global sort.
    * Compression is codec-pluggable, zstd by default: at similar ratios
    * zstd decompresses ~3-4× faster than gzip, which is real trainer
    * wall-time when a 100 TB hand-off is re-read every epoch. Neither
    * codec is block-splittable, but shard-per-file layouts parallelize at
    * file granularity anyway — `maxRecordsPerFile` is the split knob
    * here. Pass `codec = "gzip"` for consumers that require it.
    *
    * Spark's text-source shortname table has no zstd entry, so "zstd"
    * maps to parquet-hadoop's `ZstandardCodec` — a Hadoop
    * `CompressionCodec` backed by zstd-jni (both already on every Spark
    * classpath, no native Hadoop needed). It is also registered in
    * `io.compression.codecs` so Spark sessions sharing this Hadoop conf
    * decompress the `.json.zstd` shards on read; external loaders just
    * see standard zstd frames. */
  def jsonlShards(df: DataFrame, dir: String,
                  maxRecordsPerFile: Long = 100000L,
                  numShards: Option[Int] = None,
                  codec: String = "zstd"): Unit = {
    val resolved = codec match {
      case "zstd" =>
        TextSources.registerZstd(df.sparkSession)
        "org.apache.parquet.hadoop.codec.ZstandardCodec"
      case other => other
    }
    numShards.fold(df)(df.repartition(_))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", resolved)
      .json(dir)
  }

  /** Bucketed managed table — the CO-LOCATED-JOIN layout: two tables
    * bucketed on the same key with the same bucket count join WITHOUT any
    * exchange (each bucket pairs with its twin by file layout), turning
    * the recurring fact-to-fact join of a pipeline from a full corpus
    * shuffle into a zero-shuffle sort-merge. That trade is the point of
    * paying one shuffle at WRITE time: amortized over every later join
    * on the key. `sortBy` pre-sorts each bucket so the merge side skips
    * its sort too. Requires `saveAsTable` (bucket metadata lives in the
    * catalog; plain `.parquet(dir)` cannot carry it) — works against the
    * in-memory catalog locally and any metastore on a cluster.
    * `SinksSpec` proves the no-Exchange join plan. */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit =
    bucketedTableOn(df, table, Seq(bucketCol), numBuckets, sortCols)

  /** Multi-column bucket key variant: Spark only plans a bucketed scan
    * when the join keys match the bucket columns EXACTLY, so a composite
    * join key (e.g. the LSH store's (band, band-hash)) must bucket on
    * the full composite — bucketing on a subset is "disabled by query
    * planner" at join time and silently shuffles. */
  def bucketedTableOn(df: DataFrame, table: String, bucketCols: Seq[String],
                      numBuckets: Int, sortCols: Seq[String] = Nil): Unit =
    // crash-debris-proof + failure-atomic + self-read-safe (stagedSwap)
    stagedSwap(df.sparkSession, table)(
      bucketedWriter(df, bucketCols, numBuckets, sortCols))
}
