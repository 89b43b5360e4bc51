package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Queries execute into the noop datasource so every
  * projected column is actually computed — a bare count() would let
  * Catalyst prune the expensive expressions and under-report. A tiny
  * warm-up action runs first so JVM/codegen startup isn't charged to
  * whichever query happens to run first.
  *
  * Measurement hygiene (round-over-round comparability):
  *  - each engine query runs SPARK_GRAFT_ITERS times (default 3); the
  *    artifact reports the per-query MEDIAN (in `queries`, the primary
  *    metric and the shape earlier rounds used) and MIN (`queries_min`,
  *    the box-noise floor). Single runs proved ±10× noisy on this box
  *    (round-3 postmortem: ~10 apparent regressions on unchanged code).
  *  - streaming queries (`q_stream_*`) are reported in a separate
  *    `streaming` section and run ONCE: their wall time is MemoryStream
  *    micro-batch scheduling, not operator cost, and mixing them into the
  *    engine total buried real trends.
  *  - every run is followed by clearCache + Caches.unpersistAll() so no
  *    query is measured under another query's cached blocks and the cache
  *    registry doesn't grow for the length of the run.
  *  - `shuffle_mb` records each query's total shuffle traffic (read +
  *    write bytes over the LAST iteration) — the direct evidence behind
  *    shuffle-shape claims. Caveat: the conditional fixture spread
  *    (Tables.load scaladoc) adds roughly the scanned input's size to
  *    EVERY query here, because the single-row-group fixture must be
  *    redistributed before parallel work; on a realistically-split input
  *    that exchange does not exist, so a "map-only" operator reads as
  *    ~the input size, not 0, in this artifact.
  *
  * A second phase re-runs a headline subset at ~sf1 to expose super-linear
  * queries early: the sf1 input is synthesized once (cached under
  * SPARK_GRAFT_SF1_DIR, default /tmp/graft_x10_<sf>) by replicating the
  * sf0.1 tables 10× with entity keys shifted per replica — join fan-outs
  * and group cardinalities scale like a real sf1, while fixed dims
  * (nation/region) stay fixed, as TPC-H itself scales. Replica CONTENT is
  * perturbed (a replica token appended to `documents.text`, a tiny
  * deterministic per-index offset added to `embeddings.embedding`) so
  * near-dup structure scales realistically: unperturbed replicas made
  * every duplicate group an exact-equal flood that `capBuckets` dropped,
  * so dedup queries measured bucket-dropping instead of scaling (round-3
  * finding: components ran FASTER at 10× data). Disable with
  * SPARK_GRAFT_SF1=0.
  */
object Bench {

  /** Entity-key columns that grow with scale factor (nation/region stay
    * fixed-size, so their keys — including FKs to them — never shift). */
  private val ShiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"),
    "nation" -> Seq.empty,
    "region" -> Seq.empty)

  private val KeyStride = 100000000L // replica r shifts keys by r * stride

  /** Headline subset for the sf1 point: one representative per family
    * (scan-agg, joins, filter-scan, pattern agg, window, dedup exact +
    * minhash, native fingerprint, ANN, text hygiene, canonicalization). */
  private val Sf1Queries: Seq[String] = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_pattern_agg", "q_star_join",
    "q_session_stats", "q_dedup_exact", "q_doc_fingerprint",
    "q_dedup_minhash", "q_ann_cosine", "q_dedup_embedding_lsh",
    "q_quality_filter", "q_repetition", "q_pii_scrub", "q_contamination",
    "q_dedup_components", "q_token_familiarity", "q_global_shuffle",
    "q_span_dedup", "q_dedup_jaccard", "q_dedup_semantic", "q_tfidf_topk",
    "q_feature_hash", "q_multimodal_features")

  /** Per-replica content perturbation, so replicas are NEAR-dups of the
    * original rather than exact-equal floods (see class doc). Replica 0 is
    * the untouched original. Text gains one trailing replica token (most
    * shingles shared → minhash/simhash still find the pair; fingerprints
    * differ → no exact-dup flood); embeddings get a per-index offset of at
    * most ±3e-3·r (cosine to the original stays ≈1 → still a near-dup, but
    * no longer bit-equal → SRP buckets spread instead of flooding). */
  private[graft] def perturb(table: String, r: Int, df: DataFrame): DataFrame =
    if (r == 0) df
    else table match {
      case "documents" =>
        df.withColumn("text", concat(col("text"), lit(s" qsreplica$r")))
      case "embeddings" =>
        df.withColumn("embedding", transform(col("embedding"),
          (x, i) => x + ((i % 7) - 3).cast("float") * lit(0.001f * r)))
      case _ => df
    }

  /** Replicate sf0.1 into a ~sf1 directory, once (marker-gated; the marker
    * name is versioned so fixture-generation changes invalidate stale
    * /tmp copies from earlier rounds). */
  private def buildSf1(spark: SparkSession, srcDir: String, dstDir: String,
                       replicas: Int): Unit = {
    // marker encodes the replica count: an explicit SPARK_GRAFT_SF1_DIR
    // reused with a different SPARK_GRAFT_SF1_REPLICAS must rebuild, not
    // silently measure the stale multiplier
    val marker = java.nio.file.Paths.get(dstDir, s"_BUILT_V2_r$replicas")
    if (java.nio.file.Files.exists(marker)) return
    // events is TIMESTAMP(NANOS): read raw (ts as long) and write the long
    // back so graft.sources.Tables.events keeps working on the copy.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ShiftCols.foreach { case (table, keys) =>
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val replicated =
        if (keys.isEmpty) src
        else (0 until replicas).map { r =>
          perturb(table, r,
            keys.foldLeft(src)((d, k) => d.withColumn(k, col(k) + lit(r * KeyStride))))
        }.reduce(_ unionByName _)
      replicated.write.mode("overwrite").parquet(s"$dstDir/$table.parquet")
    }
    java.nio.file.Files.createFile(marker)
  }

  /** Accumulates shuffle read/write bytes across completed stages — the
    * bench's direct evidence for shuffle claims ("map-only" must read as
    * 0 MB here, not just as a fast wall time). */
  private class ShuffleTally extends org.apache.spark.scheduler.SparkListener {
    private val read = new java.util.concurrent.atomic.AtomicLong
    private val write = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0L); write.set(0L) }
    def mb: (Double, Double) =
      (read.get / 1048576.0, write.get / 1048576.0)
  }

  /** Run each named query `iters` times; returns name → (wall times,
    * (shuffle read MB, shuffle write MB) of the LAST iteration).
    * Cache state is wiped between runs so iteration i+1 isn't measured
    * against iteration i's persisted intermediates. */
  private def timeQueries(spark: SparkSession, dir: String,
                          names: Seq[String], iters: Int)
      : Seq[(String, (Seq[Double], (Double, Double)))] = {
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    try names.map { name =>
      val fn = SparkEntry.queries(name)
      var shuffle = (0.0, 0.0)
      val times = (1 to iters).map { i =>
        if (i == iters) {
          org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
          tally.reset()
        }
        val t0 = System.nanoTime()
        try fn(spark, dir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == iters) {
          org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
          shuffle = tally.mb
        }
        // Operators persist intermediate indexes (Dedup); drop them so
        // later runs aren't measured under another run's cache pressure,
        // and release the tracked handles so a long bench doesn't
        // accumulate cached blocks.
        spark.catalog.clearCache()
        // unpersistAll (not just the dedup scope): ivf/sources-scoped
        // entries otherwise keep plan references in Caches.registered for
        // the whole run — an unbounded registry leak in long sessions
        graft.operators.Caches.unpersistAll()
        dt
      }
      name -> ((times, shuffle))
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def toJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** Median (primary), min, totals, and per-query shuffle MB (read+write,
    * last iteration) for one timed section. */
  private def sectionJson(timed: Seq[(String, (Seq[Double], (Double, Double)))])
      : (Double, String) = {
    val med = timed.map { case (n, (ts, _)) => n -> median(ts) }
    val mn = timed.map { case (n, (ts, _)) => n -> ts.min }
    val sh = timed.map { case (n, (_, (r, w))) =>
      n -> (math.rint((r + w) * 100) / 100) }
    val total = med.map(_._2).sum
    (total, s""""total":$total,"queries":${toJson(med)},"queries_min":${toJson(mn)},"shuffle_mb":${toJson(sh)}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    spark.read.parquet(s"$sfDir/nation.parquet").count() // IO warm-up
    // SPARK_GRAFT_ONLY=q_a,q_b: iterate on a subset (skips the sf1 phase)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val all = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val (streamNames, engineNames) = all.partition(_.startsWith("q_stream_"))
    // engine section reuses sectionJson (same extraction as streaming/sf1)
    // and splices its fields at the top level of the line
    val (total, engineSection) = sectionJson(timeQueries(spark, sfDir, engineNames, iters))
    // Streaming: micro-batch scheduling dominates, one iteration is enough
    // and medians would just re-measure the scheduler (class doc).
    val streamingJson =
      if (streamNames.isEmpty) ""
      else {
        val (_, sj) = sectionJson(timeQueries(spark, sfDir, streamNames, 1))
        s""","streaming":{$sj}"""
      }

    // SPARK_GRAFT_SF1_ONLY=q_a,q_b: iterate on a subset of the sf1 phase
    // (forces the phase on even when SPARK_GRAFT_ONLY trimmed the engine
    // phase, so a single superlinear suspect can be re-measured alone).
    val sf1Only = sys.env.get("SPARK_GRAFT_SF1_ONLY").map(_.split(',').toSet)
    val sf1Json =
      if (sys.env.get("SPARK_GRAFT_SF1").contains("0") ||
          (only.isDefined && sf1Only.isEmpty)) ""
      else {
        // cache key includes the source SF so an sf0.01 iteration run can't
        // poison the driver's sf0.1 bench with a stale small copy
        val srcTag = java.nio.file.Paths.get(sfDir).getFileName.toString
        // SPARK_GRAFT_SF1_REPLICAS widens the scale probe (e.g. 20 for a
        // second scaling point); the default cache dir is replica-tagged
        // so different multipliers never share a fixture.
        val replicas = sys.env.getOrElse("SPARK_GRAFT_SF1_REPLICAS", "10").toInt
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
          s"/tmp/graft_x${replicas}_$srcTag")
        val tBuild0 = System.nanoTime()
        buildSf1(spark, sfDir, sf1Dir, replicas)
        val buildSec = (System.nanoTime() - tBuild0) / 1e9
        // Warm pass: pull every sf1 table through the page cache before the
        // timed window, so the first query isn't charged the cold read of
        // the freshly built replica set (measured as an implausible 68 s on
        // an otherwise sub-second scan-agg). events is TIMESTAMP(NANOS), so
        // the raw read needs the legacy flag even when the build was
        // skipped. The warm pass is timed and reported (warm_sec) so the
        // methodology stays visible in the artifact.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val tWarm0 = System.nanoTime()
        ShiftCols.keys.foreach { t =>
          spark.read.parquet(s"$sf1Dir/$t.parquet").count()
        }
        val warmSec = (System.nanoTime() - tWarm0) / 1e9
        val sf1Names = Sf1Queries.filter(n => sf1Only.forall(_.contains(n)))
        val (_, sf1Section) = sectionJson(timeQueries(spark, sf1Dir, sf1Names, iters))
        s""","sf1":{"dir":"$sf1Dir","build_sec":$buildSec,"warm_sec":$warmSec,"iters":$iters,$sf1Section}"""
      }

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,$engineSection,"sf":"$sfDir"$streamingJson$sf1Json}"""
    println(line)
    // Also persist the full line: the driver's stdout tail-capture truncated
    // a round's artifact once; the file is the complete record.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
