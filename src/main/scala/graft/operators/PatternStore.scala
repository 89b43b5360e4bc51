package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8/A6/F12: parquet-backed pattern history replacing the reference's
  * 14-table SQLite cache (`utils/cache_manager.py:63-247`).
  *
  * Arrays persist natively in Parquet, so the reference's junction tables
  * and JSON-encoded columns disappear. Incremental enrichment keeps the
  * reference's additive upsert semantics (`cache_manager.py:591-607`):
  * union + re-aggregate via [[Patterns.merge]] — the same decomposable
  * aggregate that Structured Streaming would run with keyed state.
  *
  * TTL validity (`cache_manager.py:33-39,346-354`) is a sidecar
  * `_ttl_expiry_ms` file per store, not engine logic.
  */
object PatternStore {

  /** Level TTLs from the reference (hours): data collection 24, pattern
    * analysis 12, dbt integration 6, optimization 3. */
  val LevelTtlHours: Map[Int, Int] = Map(1 -> 24, 2 -> 12, 3 -> 6, 4 -> 3)

  private def ttlPath(dir: String) = Paths.get(dir, "_ttl_expiry_ms")

  def save(patterns: DataFrame, dir: String, ttlHours: Int, nowMs: Long): Unit = {
    patterns.write.mode("overwrite").parquet(dir)
    Files.writeString(ttlPath(dir), (nowMs + ttlHours * 3600L * 1000L).toString)
  }

  def isValid(dir: String, nowMs: Long): Boolean =
    Files.exists(ttlPath(dir)) &&
      Files.readString(ttlPath(dir)).trim.toLong > nowMs

  def load(spark: SparkSession, dir: String): Option[DataFrame] =
    if (Files.exists(Paths.get(dir))) Some(spark.read.parquet(dir)) else None

  /** A6: merge freshly computed patterns into history (additive upsert —
    * re-running over the same logs double-counts, as the reference does;
    * documented quirk, SURVEY.md §7.4 #3). */
  def enrich(spark: SparkSession, fresh: DataFrame, dir: String,
             ttlHours: Int = 12, nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val merged = load(spark, dir) match {
      case Some(hist) => Patterns.merge(fresh, hist.select(fresh.columns.map(org.apache.spark.sql.functions.col): _*))
      case None => fresh
    }
    // Two-phase write: the merge plan reads the directory being replaced.
    val tmp = dir + "_staging"
    merged.write.mode("overwrite").parquet(tmp)
    val out = spark.read.parquet(tmp)
    save(out, dir, ttlHours, nowMs) // write action: dir fully materialized here
    deleteRecursively(Paths.get(tmp))
    spark.read.parquet(dir)
  }

  /** A6 at 100 TB: the reference's hottest recurring operation is this
    * enrichment (`cache_manager.py:591-607`), and [[enrich]]'s
    * union+re-agg re-shuffles the FULL accumulated history on
    * `pattern_id` every run. The scale path keeps history as a
    * `pattern_id`-bucketed, bucket-sorted catalog table
    * ([[graft.sources.Sinks.bucketedTable]]) and merges via
    * [[Patterns.mergeJoin]], with two regimes chosen per delta:
    *
    *  - BUCKET-PRUNED (delta touches < half the buckets — the steady
    *    state at scale, where a delta's few hundred distinct patterns
    *    land in a few of ~1024 buckets): only the touched buckets'
    *    files are read, merged, and REWRITTEN; untouched bucket files
    *    are never opened and stay byte-identical (spec-proven). Both
    *    read and write I/O are O(touched buckets), not O(history) —
    *    the full-history rewrite was the one remaining per-delta
    *    scale-killer. The touched subset is re-read as plain parquet
    *    (file-level pruning has no bucket-filter API), so the merge
    *    shuffles that subset — bounded by the same O(touched) — and
    *    the file swap is crash-safe via a write-ahead journal
    *    (`_swap_journal`: roll forward if all adds landed, roll back
    *    otherwise, replayed on the next enrich after a crash).
    *    Bucket-id assignment reuses Spark's own bucketing function
    *    (`pmod(hash(pattern_id), n)` — `hash` IS Murmur3(seed 42),
    *    identical to `HashPartitioning.partitionIdExpression`), and
    *    the spec asserts file/bucket purity after a pruned swap.
    *
    *  - FULL (delta touches most buckets): the r4 shape — full-outer
    *    sort-merge join against the bucketed history scan, which needs
    *    NO Exchange and NO Sort (bucket layout provides both; set
    *    `spark.sql.legacy.bucketedTableScan.outputOrdering=true` so the
    *    planner trusts bucket sort metadata); only the fresh delta pays
    *    a shuffle. The rewrite is O(history), but so is the touched
    *    data — pruning would not help. The table swap is now crash-safe
    *    too: rename live→backup, staging→live, drop backup (a leftover
    *    backup or staging from a crashed run is recovered/dropped on
    *    entry — the previous non-atomic DROP+RENAME could lose the live
    *    table).
    */
  def enrichBucketed(spark: SparkSession, fresh: DataFrame, table: String,
                     numBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val staging = table + "_staging"
    val backup = table + "_backup"
    if (!spark.catalog.tableExists(table)) {
      // crash recovery: a backup with no live table means a full-path swap
      // died between its two renames — the backup IS the last good history
      if (spark.catalog.tableExists(backup))
        spark.sql(s"ALTER TABLE `$backup` RENAME TO `$table`")
    }
    if (spark.catalog.tableExists(staging)) spark.sql(s"DROP TABLE `$staging`")
    if (spark.catalog.tableExists(backup)) spark.sql(s"DROP TABLE `$backup`")
    if (!spark.catalog.tableExists(table)) {
      graft.sources.Sinks.bucketedTable(fresh, table, "pattern_id",
        numBuckets, sortCols = Seq("pattern_id"))
    } else {
      val loc = tableDir(spark, table)
      val fs = fsFor(spark, loc)
      replaySwapJournal(fs, loc)
      spark.catalog.refreshTable(table)
      val touched = fresh
        .select(pmod(hash(col("pattern_id")), lit(numBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (touched.size * 2 >= numBuckets) {
        val merged = Patterns.mergeJoin(fresh, spark.table(table))
        graft.sources.Sinks.bucketedTable(merged, staging, "pattern_id",
          numBuckets, sortCols = Seq("pattern_id"))
        spark.sql(s"ALTER TABLE `$table` RENAME TO `$backup`")
        spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
        spark.sql(s"DROP TABLE `$backup`")
      } else {
        val liveByBucket = bucketFiles(fs, loc)
        val oldFiles = liveByBucket.filter { case (b, _) => touched(b) }
          .values.flatten.toSeq
        val schema = spark.table(table).schema
        val histTouched =
          if (oldFiles.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else spark.read.schema(schema).parquet(oldFiles.map(_.toString): _*)
        val merged = Patterns.mergeJoin(fresh, histTouched)
        graft.sources.Sinks.bucketedTable(merged, staging, "pattern_id",
          numBuckets, sortCols = Seq("pattern_id"))
        val newByBucket = bucketFiles(fs, tableDir(spark, staging))
        require(newByBucket.keySet.subsetOf(touched),
          s"merged rows escaped the touched bucket set: ${newByBucket.keySet} vs $touched")
        swapBucketFiles(fs, loc, oldFiles, newByBucket.values.flatten.toSeq)
        spark.sql(s"DROP TABLE `$staging`") // its files were moved into `loc`
        spark.catalog.refreshTable(table)
      }
    }
    spark.table(table)
  }

  // ---- bucketed-store file plumbing -----------------------------------
  // All listing/moves/journal IO goes through org.apache.hadoop.fs
  // .FileSystem, resolved from the table location's own scheme — the
  // store works unchanged on HDFS/S3A/file://; the local specs exercise
  // the exact code path production takes (file:// is just another
  // Hadoop FS).

  private type HPath = org.apache.hadoop.fs.Path

  private def tableDir(spark: SparkSession, table: String): HPath =
    new HPath(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  private def fsFor(spark: SparkSession,
                    p: HPath): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Data files of a bucketed table's directory, grouped by the bucket id
    * encoded in the file name (`part-<task>-<uuid>_<bucket>.c000...`). */
  private def bucketFiles(fs: org.apache.hadoop.fs.FileSystem,
                          dir: HPath): Map[Int, Seq[HPath]] = {
    val BucketRe = "_(\\d+)\\.".r
    val parts = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    parts.groupBy(p => BucketRe.findFirstMatchIn(p.getName) match {
      case Some(m) => m.group(1).toInt
      case None => sys.error(s"bucketed data file without bucket id: $p")
    })
  }

  /** Journaled swap: record intent (ADD new file names, DEL old ones) in
    * `_swap_journal`, move the new files in, delete the old, drop the
    * journal. The journal is published atomically (write to a temp name,
    * then rename) so readers can never observe a torn journal.
    * [[replaySwapJournal]] makes any crash point recoverable. */
  private def swapBucketFiles(fs: org.apache.hadoop.fs.FileSystem, loc: HPath,
                              oldFiles: Seq[HPath],
                              newFiles: Seq[HPath]): Unit = {
    val journal = new HPath(loc, "_swap_journal")
    val tmp = new HPath(loc, "_swap_journal.tmp")
    val lines =
      newFiles.map(f => s"ADD ${f.getName}") ++
        oldFiles.map(f => s"DEL ${f.getName}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, journal), s"could not publish swap journal at $journal")
    newFiles.foreach { f =>
      require(fs.rename(f, new HPath(loc, f.getName)), s"move failed: $f")
    }
    oldFiles.foreach(f => fs.delete(f, false))
    fs.delete(journal, false)
  }

  /** Recover from a crash mid-[[swapBucketFiles]]: if every ADD landed the
    * old files were safe to drop — roll forward (delete remaining DELs);
    * otherwise the copy phase died — roll back (remove partial ADDs; all
    * DELs are still present because deletion only starts after the last
    * ADD). A journal with ANY unparsable line (torn write on a filesystem
    * without atomic rename) is treated as rollback too: the moves only
    * start after the journal is fully published, so the live files are
    * intact and deleting whatever parseable ADDs exist restores the
    * pre-swap state — a corrupt journal must never brick the store.
    * Idempotent; no-op when no journal exists. */
  private def replaySwapJournal(fs: org.apache.hadoop.fs.FileSystem,
                                loc: HPath): Unit = {
    val tmp = new HPath(loc, "_swap_journal.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false) // unpublished journal: no-op swap
    val journal = new HPath(loc, "_swap_journal")
    if (!fs.exists(journal)) return
    val in = fs.open(journal)
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val parsed = content.linesIterator.filter(_.nonEmpty).toSeq.map { s =>
      s.split(" ", 2) match {
        case Array(op @ ("ADD" | "DEL"), name) if name.nonEmpty =>
          Some((op, new HPath(loc, name)))
        case _ => None
      }
    }
    val corrupt = parsed.exists(_.isEmpty)
    val adds = parsed.flatten.collect { case ("ADD", p) => p }
    val dels = parsed.flatten.collect { case ("DEL", p) => p }
    if (!corrupt && adds.forall(fs.exists))
      dels.filter(fs.exists).foreach(p => fs.delete(p, false))
    else
      adds.filter(fs.exists).foreach(p => fs.delete(p, false))
    fs.delete(journal, false)
  }

  /** `--force-reset` (`querysight.py:292`, reset impl
    * `cache_manager.py`): wipe the store directory and its TTL sidecar. */
  def reset(dir: String): Unit = deleteRecursively(Paths.get(dir))

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
