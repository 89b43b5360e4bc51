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
  *  - each engine query runs SPARK_GRAFT_ITERS times (default 2); the
  *    artifact reports the per-query MEDIAN (in `queries`, the primary
  *    metric and the shape earlier rounds used) and MIN (`queries_min`,
  *    the box-noise floor). Single runs proved ±10× noisy on this box
  *    (round-3 postmortem: ~10 apparent regressions on unchanged code).
  *    r17 exception: an engine query whose FIRST timed iteration ran
  *    sub-second keeps that one sample (median == min for it) and skips
  *    the forced GC — the absolute noise band of a sub-second query is
  *    bounded by its own cost, and the saved wall time is what fits the
  *    serving-scale phases inside the driver's 2250 s window (the r16
  *    artifact lost them to budget). Expensive queries keep the full
  *    min-of-iters protocol; round-over-round comparisons of SUB-SECOND
  *    mins therefore carry a small single-sample upward bias from r17 on
  *    (same class of bias as the r16 iters 3→2 move, same quotable
  *    reason). Since r18 the artifact carries `n_samples` per query (so
  *    one-sample medians are distinguishable from min-of-iters, the r17
  *    ADVICE) and a SECOND-SAMPLE GUARD: a sub-second single whose
  *    pre-query calibration sample runs hot against the run's own
  *    median keeps its second iteration anyway, listed under
  *    `resampled`.
  *  - CONTENTION SENTINEL: a fixed calibration query (`range(5e8).sum`,
  *    pure codegen arithmetic — constant work) runs before every query
  *    and once at the end of each phase; its wall time is recorded per
  *    query (`calibration_sec`) and any query whose surrounding samples
  *    deviate >2× from the phase's own calibration median is listed in
  *    `contaminated`. Round-4 postmortem: the official artifact carried
  *    an 11× phantom regression (q_dbt_coverage 17.1 s vs 1.25 s
  *    re-measured) because a concurrent process owned the box during its
  *    window — median-of-3 cannot self-diagnose when all 3 iterations
  *    share the noisy window; the sentinel makes that adjudicable from
  *    the artifact alone.
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
  * Scale phases beyond sf0.1:
  *  - `sf1`: a headline subset re-runs at ~sf1 (sf0.1 replicated 10×
  *    with entity keys shifted per replica; fixed dims stay fixed, as
  *    TPC-H itself scales). Replica CONTENT is perturbed (a replica
  *    token appended to `documents.text`, a tiny deterministic per-index
  *    offset added to `embeddings.embedding`) so near-dup structure
  *    scales realistically: unperturbed replicas made every duplicate
  *    group an exact-equal flood that `capBuckets` dropped (round-3
  *    finding: components ran FASTER at 10× data). The sf1 section also
  *    carries `recall_at10` for the SRP and IVF ANN paths vs brute force
  *    — the recall/cost trade-off at a scale point, not just the toy
  *    spec size.
  *  - `sf20`: the same probe at 20× — a second scaling point that
  *    separates linear from superlinear operators (it is what exposed
  *    q_dedup_jaccard in round 4).
  *  - `probe_controlled`: the pair-output linearity experiment — the
  *    AUTHORITATIVE scale instrument for jaccard and containment (they
  *    are excluded from the natural phases; see the Sf1Queries scaladoc
  *    for the df-census evidence). In "controlled" fixture mode every
  *    replica token is salted per replica (`w` → `w~r<k>`), a
  *    Jaccard-preserving bijection WITHIN each replica that zeroes
  *    overlap ACROSS replicas: true near-dup pair volume grows
  *    O(replicas) (each replica contributes exactly replica-0's internal
  *    pairs) instead of the natural mode's O(replicas²) (every doc pairs
  *    with all its perturbed copies). At constant per-row pair volume, a
  *    linear operator must show time ratios ≈ data ratios;
  *    superlinearity here would be operator-inherent, not
  *    fixture-driven. The probe pins the join strategy (AQE broadcast
  *    flips off) so shuffle bytes compare across levels, and emits
  *    `jaccard_stages` per-stage candidate counts. Disable with
  *    SPARK_GRAFT_SF1=0 / SPARK_GRAFT_SF20=0 / SPARK_GRAFT_PROBE=0;
  *    SPARK_GRAFT_PROBE=1 forces the probe on under ONLY/SF1_ONLY
  *    trimming (isolated re-measurement of an ingestion regression).
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
    * minhash, native fingerprint, ANN, text hygiene, canonicalization,
    * real image decode).
    *
    * q_dedup_jaccard / q_dedup_containment are deliberately NOT here (r6):
    * natural-mode replication makes every doc a genuine near-dup of its
    * replicas−1 copies, so a pair-OUTPUT operator's correct answer — and
    * therefore its work — grows quadratically with replica count, while
    * the absolute df ceiling makes the measured workload NON-MONOTONIC
    * (measured at sf0.001: x10 has base-df-1 shingles at df=10, in band,
    * 4.4M enumerated pairs; at x20 EVERY shingle exceeds dfMax=20 and the
    * banded index is EMPTY — 0 candidates, so the r5 "sf20 jaccard 4.6×"
    * point timed a degenerate pipeline and the sf1>sf20 inversion was the
    * fixture's census, not GC). Their scale instrument is the controlled
    * probe below: linear true-pair volume, pinned join strategy,
    * per-stage candidate counts. */
  private val Sf1Queries: Seq[String] = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_pattern_agg", "q_star_join",
    "q_session_stats", "q_dedup_exact", "q_doc_fingerprint",
    "q_dedup_minhash", "q_ann_cosine", "q_dedup_embedding_lsh",
    "q_quality_filter", "q_repetition", "q_pii_scrub", "q_contamination",
    "q_dedup_components", "q_token_familiarity", "q_global_shuffle",
    "q_span_dedup", "q_dedup_semantic", "q_tfidf_topk",
    "q_feature_hash", "q_multimodal_features", "q_token_bpe",
    "q_paragraph_dedup", "q_ann_pq", "q_ann_ivfpq", "q_bpe_train")

  /** 20× probe set: the dedup heavies that exposed superlinearity before,
    * PLUS the shuffled-by-design operators (familiarity's vocab join,
    * tfidf's df agg, CMS, sessionization, native as-of) that previously
    * had no ≥20× evidence, PLUS q_ann_ivfpq (r13) — its two Lloyd builds
    * are the wide-accumulator aggregate shape whose scaling claim
    * ("hash N rows, not N·dim") deserves a ≥20× data point — PLUS
    * q_bpe_train (r14): tokenizer training's claim is that per-round
    * cost is VOCABULARY-bounded (the corpus collapses to distinct
    * pre-tokens once), so corpus 20× with a near-flat vocabulary should
    * scale sublinearly after the first aggregate. q_hybrid_search stays
    * engine-only: its scale components (searchBm25's tf build, IVF-PQ)
    * already carry their own points. Pair-output operators (jaccard, containment)
    * live in the controlled probe instead — see the Sf1Queries scaladoc
    * for the census evidence. */
  private val Sf20Queries: Seq[String] = Seq(
    "q_span_dedup", "q_repetition", "q_dedup_semantic", "q_dedup_minhash",
    "q_dedup_components", "q_token_familiarity",
    "q_tfidf_topk", "q_cms_heavy", "q_session_stats", "q_asof_join_native",
    "q_multimodal_features", "q_paragraph_dedup", "q_ann_ivfpq",
    "q_bpe_train")

  /** Per-replica content perturbation (see class doc). Replica 0 is the
    * untouched original.
    *  - natural: text gains one trailing replica token (most shingles
    *    shared → each replica is a NEAR-dup of the original); embeddings
    *    get a per-index offset of at most ±3e-3·r (cosine ≈ 1 → still a
    *    near-dup, not bit-equal).
    *  - controlled: EVERY token is salted per replica — a bijection that
    *    preserves within-replica Jaccard structure exactly and zeroes
    *    cross-replica overlap, holding true pair volume at O(replicas). */
  private[graft] def perturb(table: String, r: Int, df: DataFrame,
                             mode: String = "natural"): DataFrame =
    if (r == 0) df
    else table match {
      case "documents" if mode == "controlled" =>
        df.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1~r" + r))
      case "documents" =>
        df.withColumn("text", concat(col("text"), lit(s" qsreplica$r")))
      case "embeddings" =>
        df.withColumn("embedding", transform(col("embedding"),
          (x, i) => x + ((i % 7) - 3).cast("float") * lit(0.001f * r)))
      case _ => df
    }

  /** Replicate sf0.1 into a scaled directory, once (marker-gated; the
    * marker name is versioned and carries replicas+mode so fixture-
    * generation changes or a different multiplier/mode invalidate stale
    * /tmp copies instead of silently measuring them). */
  private def buildScaled(spark: SparkSession, srcDir: String, dstDir: String,
                          replicas: Int, mode: String): Unit = {
    val marker = java.nio.file.Paths.get(dstDir, s"_BUILT_V3_r${replicas}_$mode")
    if (java.nio.file.Files.exists(marker)) return
    // Read events RAW (nanosAsLong set in case the fixture is NANOS) and
    // write whatever physical ts type arrived straight back —
    // Tables.normalizeEventTs adapts on read, so the copy round-trips
    // under either fixture generation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ShiftCols.foreach { case (table, keys) =>
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val replicated =
        if (keys.isEmpty) src
        else (0 until replicas).map { r =>
          perturb(table, r,
            keys.foldLeft(src)((d, k) => d.withColumn(k, col(k) + lit(r * KeyStride))),
            mode)
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

  /** Fixed-work calibration action: pure codegen arithmetic, no IO, no
    * shuffle — its wall time varies only with how much of the box this
    * JVM actually owns at that moment. Each sample is the MIN of two
    * runs: a single GC pause (common right after the cache-churning
    * dedup queries) inflates one run, not two back-to-back, while
    * sustained external contention — the thing the sentinel exists to
    * catch — inflates both. */
  private def calibrate(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id * 3)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** One query's measurement: wall times per iteration, shuffle MB of the
    * last iteration, and — if ANY iteration threw — the first error's
    * first line. A failed query's "times" measure crash latency, not
    * work, so downstream JSON must exclude it from totals (round-7
    * postmortem: 35 crashed queries silently "ran" in 0.05–0.08 s each
    * and IMPROVED the headline total — a bench that can only err
    * optimistic is not a bench). */
  private[graft] case class QueryTiming(name: String, times: Seq[Double],
                                        shuffle: (Double, Double),
                                        error: Option[String],
                                        resampled: Boolean = false)

  /** Run each named query `iters` times; returns per-query timings plus
    * the calibration series — one sample BEFORE each query and one after
    * the last, so sample i and i+1 bracket query i's window. Cache state
    * is wiped between runs so iteration i+1 isn't measured against
    * iteration i's persisted intermediates. `lookup` is injectable so a
    * spec can prove a deliberately-broken query lands in `failed`, not
    * in `total`. */
  private[graft] def timeQueries(spark: SparkSession, dir: String,
                          names: Seq[String], iters: Int,
                          gcBetween: Boolean = false,
                          warmup: Boolean = false,
                          cheapSingleIter: Boolean = false,
                          lookup: String => (SparkSession, String) => DataFrame =
                            SparkEntry.queries)
      : (Seq[QueryTiming], Seq[Double]) = {
    val tally = new ShuffleTally
    val cal = scala.collection.mutable.ArrayBuffer.empty[Double]
    spark.sparkContext.addSparkListener(tally)
    calibrate(spark) // throwaway: don't charge codegen/scheduler warm-up
                     // of the calibration plan itself to the first sample
    try {
      val timed = names.map { name =>
        val fn = lookup(name)
        // Scale phases run each query once UNTIMED first: the first
        // execution pays whole-stage-codegen compilation and JIT of the
        // generated classes, which is phase-ordering bias, not data-volume
        // cost — it made the x10 phase (always first) measure slower than
        // its own x20 sibling at iters=1, a physical impossibility.
        if (warmup) {
          try fn(spark, dir).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
          spark.catalog.clearCache()
          graft.operators.Caches.unpersistAll()
          if (gcBetween) System.gc()
        }
        cal += calibrate(spark)
        var shuffle = (0.0, 0.0)
        var error: Option[String] = None
        // CHEAP-QUERY trim (r17, engine phase only): the r16 driver run
        // spent ~30 of its 37.5 timed-window minutes on warm+2×timed
        // executions and their forced GCs, and the budget gate dropped
        // the two serving phases that carried the round's serving-scale
        // claims. A query whose FIRST timed iteration ran sub-second
        // stops there — one sample, no forced GC: its absolute noise band
        // is bounded by its own sub-second cost, the calibration sentinel
        // still brackets the window, and a query that cheap churns too
        // little cache to bleed GC debt into a neighbor (the warm-up is
        // not the test — it pays whole-stage-codegen and would flag
        // almost nothing). Expensive queries keep the full min-of-iters
        // + GC protocol; scale phases never set this flag (their
        // sub-1.5 s queries are exactly where min-of-iters suppresses
        // the cross-scale inversion noise, the r6 finding). The shuffle
        // tally is reset per iteration so whichever iteration ends up
        // last still reports its own traffic.
        val buf = Seq.newBuilder[Double]
        var i = 0
        var stop = false
        var resampled = false
        while (i < iters && !stop) {
          i += 1
          org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
          tally.reset()
          val t0 = System.nanoTime()
          try fn(spark, dir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            if (error.isEmpty)
              error = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.nextOption().getOrElse("").take(200))
          }
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
          shuffle = tally.mb
          // unpersistAll (not just the dedup scope): ivf/sources-scoped
          // entries otherwise keep plan references in Caches.registered
          // for the whole run — an unbounded registry leak
          spark.catalog.clearCache()
          graft.operators.Caches.unpersistAll()
          var cheap = cheapSingleIter && error.isEmpty && dt <= 1.0
          // SECOND-SAMPLE GUARD (r18, the r17 verdict's ask #5): a
          // single sample taken inside a contended window would enter
          // round-over-round comparisons unchallenged. When the sample's
          // PRE-query calibration deviates from the run's own running
          // median the way the contamination rule flags (the
          // post-sample does not exist yet at this decision point), the
          // trim is suspended and the query keeps its second iteration —
          // cheap insurance that single-sample bias never contaminates a
          // cross-round claim. Resampled queries are listed by name in
          // the artifact (`resampled`).
          if (cheap && i < iters && cal.size >= 3) {
            val runMed = median(cal.toSeq)
            if (cal.last > 2.0 * runMed && cal.last > runMed + 0.15) {
              cheap = false; resampled = true
            }
          }
          // Scale phases force a full GC after each run: the r5 sf1 phase
          // measured a 10×-data query SLOWER than its own 20× point
          // because cache-churning neighbors bled GC pauses into later
          // windows — min-of-2 calibration can't subtract a pause that
          // lands inside the query itself. Draining the heap between
          // queries makes each window self-contained.
          if (gcBetween && !cheap) System.gc()
          buf += dt
          if (cheap) stop = true
        }
        QueryTiming(name, buf.result(), shuffle, error, resampled)
      }
      cal += calibrate(spark)
      (timed, cal.toSeq)
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def toJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def r2(x: Double): Double = math.rint(x * 100) / 100

  /** One timed section's (total seconds over SUCCEEDED queries, JSON
    * fields, n succeeded, n failed, n contaminated). Failed queries are
    * excluded from total/queries/queries_min/shuffle_mb — their wall
    * time is crash latency, not work — and reported by name + first
    * error line under `failed` so a broken third of the suite can never
    * read as a speed-up again (round-7 postmortem). */
  private[graft] case class Section(total: Double, json: String,
                                    nOk: Int, nFailed: Int, nContaminated: Int,
                                    mins: Seq[(String, Double)] = Seq.empty,
                                    nResampled: Int = 0, calMed: Double = 0.0)

  /** Median (primary), min, totals, per-query shuffle MB (read+write,
    * last iteration), the contention sentinel (calibration series +
    * contaminated list), and the failed map for one timed section. */
  private[graft] def sectionJson(timedAndCal: (Seq[QueryTiming], Seq[Double]),
                          calThreshold: Double = 2.0): Section = {
    val (timed, cal) = timedAndCal
    val ok = timed.filter(_.error.isEmpty)
    val med = ok.map(t => t.name -> median(t.times))
    val mn = ok.map(t => t.name -> t.times.min)
    val sh = ok.map(t => t.name -> r2(t.shuffle._1 + t.shuffle._2))
    val failed = timed.flatMap(t => t.error.map(t.name -> _))
    val calMed = if (cal.isEmpty) 0.0 else median(cal)
    // query i's window is bracketed by samples i and i+1; a sample marks
    // the window contended when it exceeds calThreshold× the phase's own
    // median (2× for the engine phase; 1.5× for scale phases, whose r5
    // list demonstrably under-flagged GC adjacency) AND clears an
    // absolute 150 ms slack over that median. The relative test alone
    // flagged 50-60 ms of scheduler jitter on the ~100 ms clean floor as
    // "contamination" (r6 isolated sf1 run: flat 0.09-0.16 s series, four
    // spurious flags); real contention measures in multiples of the floor
    // (the r6 shared-session sf1 tail hit 0.68-1.62 s) and still trips
    // both tests.
    def hot(c: Double) = c > calThreshold * calMed && c > calMed + 0.15
    val contaminated = timed.indices.collect {
      case i if calMed > 0 && (hot(cal(i)) || hot(cal(i + 1))) => timed(i).name
    }
    val calPer = timed.indices.map(i => timed(i).name -> r2(cal(i)))
    val total = med.map(_._2).sum
    val failedJson = failed
      .map { case (n, msg) => "\"" + n + "\":" + jsonStr(msg) }
      .mkString("{", ",", "}")
    // Drift-normalized floor: min ÷ the phase's own calibration median.
    // The box's per-boot speed varies ~1.5× (r10 postmortem: dozens of
    // +60% sub-second "regressions" at cal 0.10→0.13, all drift);
    // dividing by the sentinel's constant-work time cancels uniform
    // slowdown, so round-over-round comparisons quote THIS field and a
    // protocol run is only needed when the normalized figure moves.
    // Unit is "calibration multiples", not seconds; within-round query
    // ranking still reads queries_min.
    val mnNorm =
      if (calMed <= 0) Seq.empty
      else ok.map(t => t.name -> r2(t.times.min / calMed))
    // per-query sample counts (r17 ADVICE): the single-sample trim makes
    // `queries` a one-sample median for most sub-second engine queries —
    // the artifact now says WHICH, so round-over-round comparisons can
    // tell one-sample medians from min-of-iters medians instead of
    // guessing from magnitudes. `resampled` lists the trim suspensions
    // (the second-sample guard fired on a hot pre-query calibration).
    val nsamp = ok.map(t => "\"" + t.name + "\":" + t.times.length)
      .mkString("{", ",", "}")
    val resampled = ok.filter(_.resampled).map(_.name)
    Section(total,
      s""""total":$total,"queries":${toJson(med)},"queries_min":${toJson(mn)},"queries_min_normalized":${toJson(mnNorm)},"shuffle_mb":${toJson(sh)},""" +
        s""""n_samples":$nsamp,"resampled":${resampled.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""calibration_sec":${toJson(calPer)},"calibration_median":${r2(calMed)},""" +
        s""""contaminated":${contaminated.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""n_failed":${failed.size},"failed":$failedJson""",
      ok.size, failed.size, contaminated.size, mn, resampled.size, calMed)
  }

  /** recall@k of the SRP and IVF approximate paths vs brute force over
    * the same query set — the ANN trade-off at a real scale point.
    * Returns (srp recall at the SHIPPED defaults, ivf recall, and the
    * SRP recall/cost curve: (planes, probes, recall, sec) per swept
    * config, timing the same noop materialization the engine phase uses).
    * The curve is the evidence behind the default: r5's single-probe
    * planes=6 lost a fifth of true neighbors (0.81); multi-probe buys
    * recall at sub-linear cost because only the broadcast query side
    * fans out. */
  private def annRecall(spark: SparkSession, dir: String, k: Int = 10)
      : (Map[String, Double], String) = {
    import graft.operators.{Ivf, Similarity}
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val pred = col("vid") % 20 === 0
    def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
    val bf = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k))
      .persist()
    val nBf = bf.count().toDouble
    def recallOf(approx: DataFrame): Double =
      if (nBf == 0) 1.0
      else r2(pairs(approx).join(bf, Seq("query_id", "neighbor_id"), "left_semi")
        .count() / nBf)
    // probes is capped at planes+1 (single-bit flips only), so the
    // "more probes" point at planes=6 is 7, not 8
    val curve = Seq((6, 1), (6, 2), (6, 4), (6, 7), (8, 4)).map {
      case (planes, probes) =>
        val q = Similarity.srpTopK(emb, "vec_id", "embedding", pred, k,
          planes = planes, probes = probes)
        // min of FIVE runs (r14; was three in r13, two in r12): this
        // curve keeps publishing non-cost-monotone points when every
        // sample of one config lands in a contended window — r9's
        // single-sample (6,4)=10.7 s, r12's min-of-two (6,2)=18.39 s,
        // r13's min-of-three (6,2)=4.60 s vs (6,4)=1.64 s. The sweep is
        // cheap (~2 s/sample); five samples make an all-in-one-window
        // hit vanishingly unlikely. Curve only — the engine/scale
        // phases keep their calibrated min-of-iters protocol.
        // NOTE on semantics: operator caches (Caches registry) are only
        // cleared at annRecall's end, so the second sample re-reads
        // frames the first sample cached — the min is effectively a
        // WARM-cache cost, a contention guard comparable across configs
        // within one curve, NOT comparable to r9's cold single-sample
        // protocol (r9→r10 curve "speedups" are partly cache warmth).
        val sec = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          q.write.mode("overwrite").format("noop").save()
          r2((System.nanoTime() - t0) / 1e9)
        }.min
        val rec = recallOf(q)
        s"""{"planes":$planes,"probes":$probes,"recall":$rec,"sec":$sec}"""
    }
    // shipped defaults (Similarity.srpTopK: planes=6, probes=4)
    val srp = recallOf(Similarity.srpTopK(emb, "vec_id", "embedding", pred, k))
    val ivf = recallOf(Ivf.topK(emb, "vec_id", "embedding", pred, k,
      numCentroids = 16, nProbe = 4))
    // the r13 ladder rungs: flat-PQ ADC (8×16 codes) and the composed
    // IVF-PQ serving config (nProbe=4 of 16 cells) — recall of the
    // LOSSY-code paths vs exact brute force, beside the code-free paths
    val qpred = col("query_id") % 20 === 0
    val pq = recallOf(graft.operators.Pq.topK(emb, "vec_id", "embedding",
      qpred, k, m = 8, numCentroids = 16, dim = 64))
    val ivfpq = recallOf(graft.operators.Pq.ivfPqTopK(emb, "vec_id",
      "embedding", qpred, k, m = 8, numCentroids = 16, dim = 64,
      coarseK = 16, nProbe = 4))
    // two-stage refinement (r15): the same serving config with an exact
    // re-rank over the 4k ADC shortlist — the cheap recall lift every PQ
    // deployment takes (Pq.ivfPqTopKRerank scaladoc)
    val ivfpqRr = recallOf(graft.operators.Pq.ivfPqTopKRerank(emb, "vec_id",
      "embedding", qpred, k, m = 8, numCentroids = 16, dim = 64,
      coarseK = 16, nProbe = 4, shortlistFactor = 4))
    // factor-16 point: as the shortlist widens, rerank converges to the
    // exact-within-probed-cells ceiling (= the IVF-exact recall above) —
    // measured EQUAL at sf0.01 — showing the residual is cell coverage
    // (nProbe), not quantization: the refinement recovers everything
    // ADC lost inside the probed cells
    val ivfpqRr16 = recallOf(graft.operators.Pq.ivfPqTopKRerank(emb, "vec_id",
      "embedding", qpred, k, m = 8, numCentroids = 16, dim = 64,
      coarseK = 16, nProbe = 4, shortlistFactor = 16))
    // OPQ permutation rung (r16): cosine is permutation-invariant so the
    // brute-force ground truth is shared; the rung reads how much the
    // energy-balanced allocation moves ADC recall at unchanged bytes —
    // ~nothing on this isotropic fixture (per-dim variance ratio 1.2,
    // the Pq.balancedPermutation scaladoc), real lift on skewed-variance
    // corpora
    val opq = recallOf(graft.operators.Pq.ivfPqTopKOpq(emb, "vec_id",
      "embedding", qpred, k, m = 8, numCentroids = 16, dim = 64,
      coarseK = 16, nProbe = 4))
    bf.unpersist()
    graft.operators.Caches.unpersistAll()
    (Map("q_ann_srp" -> srp, "q_ann_ivf" -> ivf, "q_ann_pq" -> pq,
      "q_ann_ivfpq" -> ivfpq, "q_ann_ivfpq_rerank" -> ivfpqRr,
      "q_ann_ivfpq_rerank16" -> ivfpqRr16, "q_ann_opq" -> opq),
      curve.mkString("[", ",", "]"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Default 2 (r16; was 3): min-of-iters already de-noises, the engine
    // phase is ~150 queries × (warmup + iters) executions, and r15's run
    // outgrew the driver's wall-clock window entirely (rc=124) — a third
    // sample is worth less than fitting the window at all.
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt
    // WALL-CLOCK BUDGET (r16): the driver kills the bench at a fixed
    // window (~45 min observed; r15's grown phase list blew past it and
    // published rc=124/parsed:null — no evidence at all). Optional phases
    // now check remaining budget before starting and SKIP BY NAME when
    // it would not fit (each gate carries that phase's measured sf0.1
    // cost), so a full run always ends with rc=0 and the artifact records
    // exactly which evidence was traded away. Engine + streaming are
    // never skipped — they are the round's primary gate — and phases are
    // COMPUTED in priority order (opq_aniso → sparse_serve → ann_serve →
    // sf1 → sf20 → probe → bpe_train → ingest_stages → funnel_audit), so
    // when budget runs short it is the lowest-priority evidence that
    // drops first. The serve phases come BEFORE sf1 (r17, the r16
    // verdict's top ask): sf1's recall ladder has been stable for four
    // rounds — when something must drop on a slow box, it should be sf1.
    // opq_aniso LEADS (r18, the r17 verdict's top ask): it is the
    // cheapest serve-class evidence and the r17 driver window lost it
    // entirely; the r18 cost cuts (×20 serve points dropped, serve
    // phases at one timed iteration, wand_skew trimmed and
    // budget-yielding) exist so all three serve phases land in the
    // driver artifact rather than being reordered against each other
    // again.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "2250").toDouble
    val t0Run = System.nanoTime()
    def budgetLeft: Double = budgetSec - (System.nanoTime() - t0Run) / 1e9
    val skippedPhases = Seq.newBuilder[String]
    // Shared session defaults incl. the r18 driver-overhead caps —
    // rationale and the 2.86 s-vs-1.44 s session-aging measurement live
    // in the GraftSession scaladoc (r19, verdict ask #6: one engine-owned
    // definition site instead of three harness copies).
    def mkSession(): SparkSession = GraftSession.create(cpus)
    var spark = mkSession()
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    spark.read.parquet(s"$sfDir/nation.parquet").count() // IO warm-up
    // GATE DRIFT SCALING (r18, the r17 verdict's ask #1): every phase
    // estimate below is stated at a reference calibration of 0.10 s (the
    // clean-box sentinel floor); a slower box needs proportionally more
    // wall clock for the same phase, so gates scale by the measured
    // calibration ratio — a 0.13-cal box budgets honestly instead of
    // starting a phase the window cannot finish. The ratio comes from
    // the ENGINE SECTION's own calibration median (hundreds of samples
    // over the run's first half-hour; every gated phase executes after
    // it) — a boot-time probe proved useless (min-of-3 right after
    // session start measured 0.34 on a box whose in-run median was
    // 0.12: JIT and post-sbt thermal state, not steady-state speed).
    // Clamped to [1, 1.6]: a fast box never shrinks an estimate
    // (skipping early is the only safe failure mode), and a pathological
    // median must not double every gate. Published in the artifact as
    // `gate_drift`.
    var gateDrift = 1.0
    // returns body() when the drift-scaled `needSec` still fits the
    // budget; else records the skip and returns the empty JSON fragment
    def phaseGate(name: String, needSec: Double)(body: => String): String = {
      val need = needSec * gateDrift
      if (budgetLeft >= need) body
      else {
        System.err.println(
          f"[bench] budget: skipping $name (need ~${need}%.0f s at drift " +
            f"${gateDrift}%.2f, ${budgetLeft}%.0f s left)")
        skippedPhases += name
        ""
      }
    }
    // SPARK_GRAFT_ONLY=q_a,q_b: iterate on a subset (skips the scale phases)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val all = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val (streamNames, engineNames) = all.partition(_.startsWith("q_stream_"))
    // Failure accounting across every timed section, for the summary line:
    // a crashed query anywhere must surface in the <1 KB tail the driver
    // actually reads, not only deep inside an 18 KB JSON line.
    var nFailedTotal = 0
    def record(s: Section): Section = { nFailedTotal += s.nFailed; s }
    // engine section reuses sectionJson (same extraction as streaming/sf1)
    // and splices its fields at the top level of the line
    // warmup + gcBetween for the same reasons the scale phases have them:
    // the first execution pays whole-stage-codegen + C2 JIT (phase-order
    // bias), and cache-churning queries (the IVF/SRP family) otherwise
    // bleed GC debt into the NEXT calibration sample — min-of-two can't
    // subtract a collection whose debt spans both samples, so three
    // otherwise-idle r10 runs flagged the same ann_* neighbors off one
    // 0.4 s post-churn sample. The GC lands after each iteration's dt is
    // captured, so measured times are unaffected; only wall clock grows.
    val engine = record(sectionJson(timeQueries(spark, sfDir, engineNames,
      iters, gcBetween = true, warmup = true, cheapSingleIter = true)))
    val (total, engineSection) = (engine.total, engine.json)
    if (engine.calMed > 0)
      gateDrift = math.min(1.6, math.max(1.0, engine.calMed / 0.10))
    // EARLY FLUSH (r16): the engine section is the round's headline — emit
    // a parseable metric line the moment it exists, BEFORE any scale
    // phase, so a run killed later still leaves adjudicable evidence in
    // the stdout tail (BENCH_r15.json was rc=124 with parsed:null: 40+
    // minutes of clean engine numbers, zero of them published). The final
    // end-of-run lines below re-emit the complete record and win the tail
    // when the run survives.
    // Headline = this run's 12 costliest mins UNION every name the r18
    // driver metric line published (r19, verdict ask #7): the PERF
    // comparator reads consecutive rounds' metric lines, so a query that
    // merely got FASTER and left the top-12 slice must stay visible with
    // its new number instead of surfacing as "dropped_from_bench" (the
    // r18 ANN-trio phantom). Entries are only ever ADDED round-over-round
    // — the driver contract — and the union stays ≤ ~24 names, inside
    // the driver's stdout tail window.
    val prevHeadlineNames = Seq(
      "q_corpus_funnel_neardup", "q_span_scrub_maximal",
      "q_corpus_drop_audit", "q_hybrid_served", "q_hybrid_rerank",
      "q_recrawl_pipeline", "q_hybrid_search", "q_span_maximal",
      "q_dedup_minhash_incr", "q_ann_rrf", "q_bm25_index_append",
      "q_bm25_index_delete")
    def headlineJson(mins: Seq[(String, Double)]): String = {
      val byName = mins.toMap
      val names = (mins.sortBy(-_._2).take(12).map(_._1) ++
        prevHeadlineNames.filter(byName.contains)).distinct
      names.sortBy(n => -byName(n))
        .map(n => s""""$n":${r2(byName(n))}""").mkString(",")
    }
    val engineHeadline = headlineJson(engine.mins)
    println(s"""{"metric":"engine_total","value":${r2(total)},"unit":"sec",""" +
      s""""queries":{$engineHeadline},"sf":"$sfDir","n_queries":${engine.nOk},""" +
      s""""n_failed":${engine.nFailed},"n_failed_other":0,""" +
      s""""contaminated_n":${engine.nContaminated},"iters":$iters,""" +
      s""""partial":"engine_phase_only"}""")
    System.out.flush()
    // Streaming: micro-batch scheduling dominates, one iteration is enough
    // and medians would just re-measure the scheduler (class doc).
    val streamingJson =
      if (streamNames.isEmpty) ""
      else {
        val sj = record(sectionJson(timeQueries(spark, sfDir, streamNames, 1)))
        s""","streaming":{${sj.json}}"""
      }

    def enabled(envKey: String): Boolean = !sys.env.get(envKey).contains("0")

    // cache key includes the source SF so an sf0.01 iteration run can't
    // poison the driver's sf0.1 bench with a stale small copy
    val srcTag = java.nio.file.Paths.get(sfDir).getFileName.toString

    /** Build (marker-cached) + page-cache-warm + time one scaled phase.
      * The warm pass is timed and reported (warm_sec) so the methodology
      * stays visible in the artifact. Scale phases run with an untimed
      * per-query warm-up (codegen/JIT is phase-ordering bias, not
      * data-volume cost), forced GC between queries, and a 1.5×
      * contamination threshold (r5 postmortem: the sf1 phase
      * under-flagged GC adjacency and produced a 10×-data point slower
      * than its 20× sibling).
      *
      * `fixedJoin` pins the join strategy (AQE broadcast conversion off)
      * for the timed window: the controlled probe compares shuffle BYTES
      * across replica levels, and r5's "4.2× shuffle for 2× data" was AQE
      * flipping candidate-sized joins to broadcast at r10 but not r20 —
      * with the strategy pinned the same curve measures 1.95× for 2×
      * (linear). Production configs keep AQE's flip: it is strictly a
      * shuffle SAVING at the smaller scale, not a cost at the larger. */
    // Per-phase min-of-iters, kept for the cross-phase inversion report
    // (key = s"x${replicas}_$mode"). The calibration sentinel brackets
    // each query with fixed-work samples, so it catches contention that
    // ARRIVES mid-phase — but a slowdown uniform across all of a query's
    // iterations (CPU thermal / co-tenant pressure spanning the whole
    // window) slows query and calibration alike and is invisible to it.
    // A 10×-data min slower than the same query's 20×-data min is
    // physically impossible on clean numbers, so the artifact reports
    // every such inversion itself rather than leaving the contradiction
    // for the reader to discover.
    val phaseMins = scala.collection.mutable.Map.empty[String, Map[String, Double]]
    var lastRecall: Option[Map[String, Double]] = None
    // the sf1 phase's recall/cost curve, re-emitted top-level as
    // `recall_curve_sf1`: the curve's ground truth is brute-force cosine
    // over the SCALED (x10) corpus itself — i.e. the planes/probes
    // defaults are justified at the sf1 scale point, not the sf0.1
    // engine fixture
    var lastCurve: Option[String] = None

    def scalePhase(replicas: Int, mode: String, names: Seq[String],
                   phaseIters: Int, withRecall: Boolean,
                   fixedJoin: Boolean = false,
                   jaccardStages: Boolean = false,
                   prebuildIncrStore: Boolean = false,
                   prebuildAnnIndex: Boolean = false,
                   prebuildSparseIndex: Boolean = false): String = {
      // PHASE ISOLATION (r6): each scale phase gets a fresh SparkSession.
      // Sharing one session across the whole run let the engine phase's
      // ~330 executions degrade the sf1 tail — calibration (pure-CPU
      // fixed work) drifted to 13× its clean value and flagged 9/24
      // entries, while the identical phase in a fresh JVM ran flat at
      // 0.11-0.21 s with clean numbers (q_multimodal_features 1.01 s vs
      // 6.72 s contaminated). A context teardown drops the accumulated
      // driver state (listener/status stores, block manager, cleaner
      // backlog); codegen/JIT caches survive in the JVM, so the untimed
      // per-query warm-up still covers compilation bias.
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = mkSession()
      val dirTag = if (mode == "natural") s"graft_x${replicas}_$srcTag"
        else s"graft_x${replicas}_${mode}_$srcTag"
      val envOverride =
        if (replicas == 10 && mode == "natural") sys.env.get("SPARK_GRAFT_SF1_DIR")
        else None
      val scaledDir = envOverride.getOrElse(s"/tmp/$dirTag")
      val tBuild0 = System.nanoTime()
      buildScaled(spark, sfDir, scaledDir, replicas, mode)
      val buildSec = (System.nanoTime() - tBuild0) / 1e9
      // Warm pass: pull every table through the page cache before the
      // timed window, so the first query isn't charged the cold read of a
      // freshly built replica set. The raw events read needs the legacy
      // flag only when the fixture is NANOS; setting it is harmless otherwise.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tWarm0 = System.nanoTime()
      ShiftCols.keys.foreach { t =>
        spark.read.parquet(s"$scaledDir/$t.parquet").count()
      }
      val warmSec = (System.nanoTime() - tWarm0) / 1e9
      // Pre-build the incremental-ingestion store OUTSIDE the timed
      // window: history signatures computed once, the banded table
      // bucketed on the composite (band, bh) key so the timed store join
      // plans no Exchange above the history scan (PlanAuditSpec). The
      // conf gate makes q_dedup_minhash_incr_fast read the tables; it is
      // unset (and the tables dropped) before the phase returns, so no
      // other phase — and no later Verify in this working directory —
      // can silently measure the pre-built path.
      val storeBuildJson =
        if (!prebuildIncrStore) ""
        else {
          val t0 = System.nanoTime()
          val (storeD, _) = SparkEntry.incrMinhashCorpus(spark, scaledDir)
          graft.sources.Sinks.replaceTable(
            graft.operators.Dedup.minhashSignatures(storeD, "doc_id", "text",
              numHashes = 32, shingleN = 5),
            "graft_incr_sigs")
          graft.sources.Sinks.bucketedTableOn(
            graft.operators.Dedup.bandedXxhash(
              spark.table("graft_incr_sigs"), 32, 8),
            "graft_incr_banded", Seq("band", "bh"), cpus.toInt)
          spark.conf.set("graft.bench.incrStore", "1")
          s""","incr_store_build_sec":${r2((System.nanoTime() - t0) / 1e9)}"""
        }
      // Pre-build the IVF-PQ serving index OUTSIDE the timed window (the
      // incr-store seam applied to ANN): both Lloyd builds + the map-only
      // (vid, codes, centroid_id) pass land in parquet tables, the codes
      // table bucketed on centroid_id so the timed cell-pruned scoring
      // join plans no Exchange above the index scan. The conf gate makes
      // q_ann_ivfpq serve a FIXED 25-query set against the pre-built
      // index; it is unset (and the tables dropped) before the phase
      // returns. What the timed window then measures is the amortized
      // 100 TB claim: query cost is probe+ADC+rank against the index,
      // not the index construction.
      val annBuildJson =
        if (!prebuildAnnIndex) ""
        else {
          import graft.operators.{Ivf, Pq}
          val t0 = System.nanoTime()
          val emb = graft.sources.Tables.embeddings(spark, scaledDir)
          // prebuild wall clock counts against the driver's window —
          // overlap the independent trainings (Par.both, guide §2.6)
          val ((_, cents), cb) = graft.operators.Par.both(
            Ivf.build(emb, "vec_id", "embedding", k = 16, iters = 2),
            Pq.build(emb, "vec_id", "embedding", m = 8, k = 16,
              dim = 64, iters = 2))
          Pq.saveServingIndex(
            Pq.servingCodes(emb, "vec_id", "embedding", cb, cents,
              m = 8, dim = 64),
            cents, cb, "graft_ann", cpus.toInt)
          // the FIXED query set, materialized here too (r15, ADVICE):
          // rebuilding it from Tables.embeddings inside the timed window
          // re-scanned a corpus embedding column the "serve-only"
          // measurement claims is never read (row-group pruning on the
          // id predicate is not guaranteed) — serve now reads a 25-row
          // table built in the same untimed prebuild as the index
          graft.sources.Sinks.replaceTable(
            emb.select(col("vec_id").as("query_id"),
                col("embedding").as("qvec"))
              .filter(col("query_id") % 20 === 0 && col("query_id") < 500),
            "graft_ann_queries")
          graft.operators.Caches.unpersistAll()
          spark.conf.set("graft.bench.annIndex", "1")
          s""","ann_index_build_sec":${r2((System.nanoTime() - t0) / 1e9)}"""
        }
      // Pre-build the BM25 serving index OUTSIDE the timed window — the
      // sparse-retrieval twin of the ANN seam above: one corpus pass
      // lands postings (term, doc, tf, dl) in a term-bucketed table (the
      // serving join key, so a query's vocabulary prunes at the scan),
      // plus the vocabulary df table and the 1-row corpus totals. The
      // conf gate makes q_bm25_served read the tables and a FIXED
      // ~52-query set (base %97 ids, built here too); what the timed
      // window then measures is the amortized sparse-serving claim:
      // query cost is explode + postings probe + score + rank, never a
      // corpus text read or index rebuild.
      val sparseBuildJson =
        if (!prebuildSparseIndex) ""
        else {
          import graft.operators.Tfidf
          val t0 = System.nanoTime()
          val docs = graft.sources.Tables.documents(spark, scaledDir)
          // ONE corpus pass for both indexes (r18): the positional
          // postings carry exact tf/dl, so the BM25 index derives from
          // them (Tfidf.bm25IndexFromPostings) instead of a second
          // tokenize + (doc, term) shuffle via buildBm25Index
          val pos = graft.operators.Caches.tracked(
            Tfidf.positionalPostings(docs, "doc_id", "text"), "tfidf")
          val idx = Tfidf.bm25IndexFromPostings(pos)
          Tfidf.saveBm25Index(idx, "graft_bm25", cpus.toInt)
          graft.sources.Sinks.replaceTable(
            docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
              .select(col("doc_id").as("query_id"),
                array_join(slice(graft.functions.Text.tokens(
                  lower(col("text"))), 1, 3), " ").as("qtext")),
            "graft_bm25_queries")
          // the positional index for phrase serving, same bucketing
          // (dogfooding the library's own persistence call)
          Tfidf.savePositionalIndex(pos, "graft_bm25", cpus.toInt)
          graft.operators.Caches.unpersistAll()
          spark.conf.set("graft.bench.sparseIndex", "1")
          // index construction ends HERE — capture it before the census
          // jobs below, which are accounting, not building (r15 ADVICE:
          // the old interpolation charged them to the build)
          val buildSecSparse = r2((System.nanoTime() - t0) / 1e9)
          // candidate-volume accounting (the jaccard-stages precedent):
          // under natural replication every replica of a matching doc is
          // a TRUE candidate, so serve work grows with replicas BY
          // CENSUS, not by operator superlinearity — emit the fixed
          // query set's candidate row count (Σ df over query (q, ofs)
          // terms = the doc-grain rows the BM25/phrase probes move) and
          // position hits (Σ tf = the phrase aggregate's input rows) so
          // time-per-candidate is readable across scale points
          val qo = spark.table("graft_bm25_queries")
            .select(col("query_id"), explode(graft.functions.Text.tokens(
              lower(col("qtext")))).as("term"))
          val candDocs = qo.join(spark.table("graft_bm25_termstats"),
            Seq("term")).agg(sum(col("df"))).collect()(0).getLong(0)
          val candPos = qo.join(
            spark.table("graft_bm25_postings").groupBy(col("term"))
              .agg(sum(col("tf")).as("tfsum")), Seq("term"))
            .agg(sum(col("tfsum"))).collect()(0).getLong(0)
          // r16 pruning census, both optimizations measured by volume:
          // cand_phrase_docs = (query, doc) pairs the positions-last
          // intersection admits (the explode's input grain, vs
          // cand_pos_rows = every position of every phrase term — the
          // r15 explode volume); bm25_wand_full/admitted = weight rows
          // entering the serve aggregate without/with WAND.
          val phraseCands = Tfidf.phraseCandidates(
            spark.table("graft_bm25_positional"),
            spark.table("graft_bm25_queries"), "query_id", "qtext")
          val candPhrase = phraseCands.count()
          // position rows actually exploded after the intersection (vs
          // cand_pos_rows = the r15 explode volume): Σtf over candidate
          // (query, term, doc) triples
          val candPosPruned = qo.join(
              spark.table("graft_bm25_postings")
                .select(col("term"), col("doc"), col("tf")), Seq("term"))
            .join(phraseCands, Seq("query_id", "doc"), "left_semi")
            .agg(coalesce(sum(col("tf")), lit(0L))).collect()(0).getLong(0)
          val sIdx = Tfidf.loadBm25Index(spark, "graft_bm25")
          val (wandFull, wandAdmitted, wandFlagged) = Tfidf.bm25WandCensus(
            sIdx, spark.table("graft_bm25_queries"), "query_id", "qtext",
            k = 5)
          graft.operators.Caches.unpersistAll()
          // WAND-ENGAGED serving demo (r16): the natural %97 query set is
          // uniform-df (31-word fixture vocabulary) so the adaptive
          // pre-flight correctly refuses pruning on it — this instrument
          // measures the engaged case on the SAME index with a SKEWED
          // query set: each query leads with the corpus's one rare token
          // ('dup', df ≈ 2% of the common terms'), the Zipfian shape real
          // queries have. Same queries served with pruning on vs off
          // (min of 2, cache-cleared), plus the volume census — the
          // direct evidence that WAND pays exactly when the pre-flight
          // says it does. ONE fixed point per round (r16 ADVICE: the old
          // `replicas == 20` gate silently dropped the ×20 field with no
          // recorded reason) — the ×50 point, where the refusal evidence
          // carries the most scale weight; the other points emit a named
          // marker instead of a vanishing field.
          val skewJson = if (replicas != 50)
            s""""wand_skew_skipped":"runs at the x50 point only","""
          else if (budgetLeft < 420 * gateDrift)
            // the skew instrument re-confirms a THREE-round-old settled
            // adjudication (WAND default-off); when the remaining window
            // cannot hold both it and the ann_serve phase that follows,
            // the settled evidence yields — by name (r18)
            s""""wand_skew_skipped":"budget reserved for ann_serve","""
          else {
            graft.sources.Sinks.replaceTable(
              docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
                .select(col("doc_id").as("query_id"),
                  concat(lit("dup "), array_join(slice(
                    graft.functions.Text.tokens(lower(col("text"))), 1, 2),
                    " ")).as("qtext")),
              "graft_bm25_queries_skew")
            val skewQ = spark.table("graft_bm25_queries_skew")
            def skewServe(wand: Boolean, n: Int): Double = (1 to n).map { _ =>
              val t0 = System.nanoTime()
              Tfidf.searchBm25Served(sIdx, skewQ, "query_id", "qtext",
                  k = 5, wandPrune = wand)
                .write.mode("overwrite").format("noop").save()
              val dt = (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache()
              graft.operators.Caches.unpersistAll()
              dt
            }.min
            // sample trim (r18 cost discipline): the ON path is the
            // ~6×-slower settled loser — one timed run after the codegen
            // warm pass re-confirms a 6× gap fine (36 s/sample on the
            // r17 driver box); OFF keeps min-of-2 (its first run pays
            // its own codegen, the min discards it)
            skewServe(wand = true, 1) // untimed codegen/JIT warm pass
            val skewOn = skewServe(wand = true, 1)
            val skewOff = skewServe(wand = false, 2)
            val (skF, skP, skQn) = Tfidf.bm25WandCensus(sIdx, skewQ,
              "query_id", "qtext", k = 5)
            graft.operators.Caches.unpersistAll()
            // the positions-last twin of the same experiment: the skewed
            // phrases flag, so the doc-grain intersection engages and the
            // explode touches only true candidates; off = the direct
            // probe-and-explode plan the uniform %97 set keeps
            def skewPhrase(stats: Option[org.apache.spark.sql.DataFrame],
                           n: Int): Double = (1 to n).map { _ =>
              val t0 = System.nanoTime()
              Tfidf.phraseSearch(spark.table("graft_bm25_positional"),
                  skewQ, "query_id", "qtext", dfStats = stats)
                .write.mode("overwrite").format("noop").save()
              val dt = (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache()
              graft.operators.Caches.unpersistAll()
              dt
            }.min
            val stats = Some(spark.table("graft_bm25_termstats"))
            skewPhrase(stats, 1) // untimed warm pass
            val phOn = skewPhrase(stats, 1)
            val phOff = skewPhrase(None, 2)
            val phCand = Tfidf.phraseCandidates(
              spark.table("graft_bm25_positional"), skewQ,
              "query_id", "qtext").count()
            graft.operators.Caches.unpersistAll()
            s""""wand_skew":{"on_sec":${r2(skewOn)},"off_sec":${r2(skewOff)},""" +
              s""""full":$skF,"admitted":$skP,"flagged_queries":$skQn,""" +
              s""""phrase_on_sec":${r2(phOn)},"phrase_off_sec":${r2(phOff)},""" +
              s""""phrase_cand_docs":$phCand},"""
          }
          s""","sparse_index_build_sec":$buildSecSparse,$skewJson""" +
            s""""cand_doc_rows":$candDocs,"cand_pos_rows":$candPos,""" +
            s""""cand_phrase_docs":$candPhrase,""" +
            s""""cand_pos_pruned":$candPosPruned,""" +
            s""""bm25_wand_full":$wandFull,"bm25_wand_admitted":$wandAdmitted,""" +
            s""""bm25_wand_pruned_queries":$wandFlagged"""
        }
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (fixedJoin) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val timedAndCal =
        try timeQueries(spark, scaledDir, names, phaseIters, gcBetween = true,
          warmup = true)
        finally {
          if (fixedJoin)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
          if (prebuildIncrStore) {
            spark.conf.unset("graft.bench.incrStore")
            spark.sql("DROP TABLE IF EXISTS graft_incr_sigs")
            spark.sql("DROP TABLE IF EXISTS graft_incr_banded")
          }
          if (prebuildAnnIndex) {
            spark.conf.unset("graft.bench.annIndex")
            spark.sql("DROP TABLE IF EXISTS graft_ann_codes")
            spark.sql("DROP TABLE IF EXISTS graft_ann_centroids")
            spark.sql("DROP TABLE IF EXISTS graft_ann_codebook")
            spark.sql("DROP TABLE IF EXISTS graft_ann_queries")
          }
          if (prebuildSparseIndex) {
            spark.conf.unset("graft.bench.sparseIndex")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_postings")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_termstats")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_corpusstats")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_queries")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_queries_skew")
            spark.sql("DROP TABLE IF EXISTS graft_bm25_positional")
          }
        }
      // Failed queries are excluded here too: r7's "q_session_stats
      // inversion" was a crash latency at one scale beating real work at
      // the other — crash times must never enter the inversion report.
      // ann_serve phases get their own key: they share mode "natural"
      // with the sf1/sf20 phases (buildScaled reuses the replica dirs)
      // but measure serve-only work — writing them under x10_natural
      // would REPLACE the sf1 phase's whole min map and corrupt the
      // cross-phase inversion report
      phaseMins(s"x${replicas}_$mode" +
          (if (prebuildAnnIndex) "_annserve" else "") +
          (if (prebuildSparseIndex) "_sparseserve" else "")) =
        timedAndCal._1.filter(_.error.isEmpty)
          .map(t => t.name -> t.times.min).toMap
      val section = record(sectionJson(timedAndCal, calThreshold = 1.5)).json
      // Candidate-volume accounting for the jaccard linearity probe: the
      // per-stage row counts that separate "enumeration is quadratic"
      // from "the plan flipped" (Dedup.jaccardStageCounts scaladoc).
      val stagesJson =
        if (!jaccardStages) ""
        else {
          def fmt(counts: Map[String, Long]) = counts.toSeq.sortBy(_._1)
            .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
          val jc = graft.operators.Dedup.jaccardStageCounts(
            SparkEntry.jaccardCorpus(spark, scaledDir), "doc_id", "text",
            shingleN = 5, dfMax = 20, minJaccard = 0.3)
          graft.operators.Caches.unpersistAll()
          // containment candidates = the same df-banded pairs with NO
          // ratio prefilter (minJaccard=0 keeps every enumerated pair) —
          // the funnel evidence for the probe's no-prefilter suspect
          val cc = graft.operators.Dedup.jaccardStageCounts(
            SparkEntry.containmentCorpus(spark, scaledDir), "doc_id", "text",
            shingleN = 5, dfMax = 20, minJaccard = 0.0)
          graft.operators.Caches.unpersistAll()
          s""","jaccard_stages":${fmt(jc)},"containment_stages":${fmt(cc)}"""
        }
      val recallJson =
        if (!withRecall) ""
        else {
          val (recalls, curve) = annRecall(spark, scaledDir)
          lastRecall = Some(recalls)
          lastCurve = Some(curve)
          val rj = recalls.toSeq.sortBy(_._1)
            .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
          s""","recall_at10":$rj,"recall_curve":$curve"""
        }
      val strategyJson = if (fixedJoin) ""","join_strategy":"fixed"""" else ""
      s"""{"dir":"$scaledDir","replicas":$replicas,"mode":"$mode"$strategyJson,"build_sec":${r2(buildSec)}$storeBuildJson$annBuildJson$sparseBuildJson,"warm_sec":${r2(warmSec)},"iters":$phaseIters,$section$stagesJson$recallJson}"""
    }

    // SPARK_GRAFT_SF1_ONLY=q_a,q_b: iterate on a subset of the sf1 phase
    // (forces the phase on even when SPARK_GRAFT_ONLY trimmed the engine
    // phase, so a single superlinear suspect can be re-measured alone).
    val sf1Only = sys.env.get("SPARK_GRAFT_SF1_ONLY").map(_.split(',').toSet)

    // OPQ anisotropy probe — FIRST among the optional phases (r18, the
    // r17 verdict's top ask: this is the cheapest serve-class evidence
    // and the r17 driver window lost it entirely). Body comment below.
    //
    // Serve-phase cost discipline (r18, all three serve phases): the
    // ×20 points are DROPPED (×10/×50 bracket the trend — the precedent
    // r16 set when it fixed wand_skew at one point; the ×20 sparse index
    // build alone cost the r17 driver 199 s), and the timed window runs
    // ONE iteration after the untimed codegen warm-up (serve queries are
    // index-probe bound; the calibration sentinel still brackets every
    // window, and min-of-iters mattered for CROSS-SCALE inversion noise
    // on sub-1.5 s queries, which the serve family's ×10/×50 pairs are
    // not). Together these cuts are what fits opq_aniso + sparse_serve +
    // ann_serve inside the driver's 2250 s window beside the engine
    // phase — absolute cost, not another reorder.
    //
    // OPQ body (r17, the r16 verdict's ask #3): the fixture's
    // embeddings are ISOTROPIC (per-dim variance ratio 1.20, the
    // Pq.balancedPermutation scaladoc), so the sf1 recall ladder's OPQ
    // rung is recall-neutral BY CONSTRUCTION there — it proves mechanics,
    // not benefit. This probe gives the corpus the skewed per-dim energy
    // real PCA-projected/whitened embeddings carry — dim i scaled by
    // 0.88^i, deterministic and fixture-derived (the synthPng discipline:
    // no RNG, same bytes every run) — and reads recall@10 of plain
    // IVF-PQ vs the OPQ permutation against brute-force ground truth
    // over the SAME scaled vectors. Under a geometric energy decay the
    // contiguous subspace split concentrates every high-variance
    // dimension in subspace 0 (the allocation pathology OPQ §4 exists
    // for); the serpentine permutation spreads one per energy tier.
    // SPARK_GRAFT_OPQ_ANISO=1 forces it on under trimming; "0" disables.
    val opqAnisoForced = sys.env.get("SPARK_GRAFT_OPQ_ANISO").contains("1")
    val opqAnisoJson =
      if (!enabled("SPARK_GRAFT_OPQ_ANISO") ||
          ((only.isDefined || sf1Only.isDefined) && !opqAnisoForced)) ""
      else phaseGate("opq_aniso", 90) {
        import graft.operators.{Pq, Similarity}
        val emb = graft.sources.Tables.embeddings(spark, sfDir)
          .withColumn("embedding", transform(col("embedding"),
            (x, i) => (x.cast("double")
              * pow(lit(0.88), i.cast("double"))).cast("float")))
        val pred = col("vid") % 20 === 0
        val qpred = col("query_id") % 20 === 0
        val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            pred, 10).select(col("query_id"), col("neighbor_id")).persist()
        val nBf = bf.count().toDouble
        def recallOf(approx: DataFrame): Double =
          if (nBf == 0) 1.0
          else r2(approx.select(col("query_id"), col("neighbor_id"))
            .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
            .count() / nBf)
        val plain = recallOf(Pq.ivfPqTopK(emb, "vec_id", "embedding",
          qpred, 10, m = 8, numCentroids = 16, dim = 64, coarseK = 16,
          nProbe = 4))
        val opq = recallOf(Pq.ivfPqTopKOpq(emb, "vec_id", "embedding",
          qpred, 10, m = 8, numCentroids = 16, dim = 64, coarseK = 16,
          nProbe = 4))
        bf.unpersist()
        graft.operators.Caches.unpersistAll()
        s""","opq_aniso":{"decay":0.88,"recall_ivfpq":$plain,""" +
          s""""recall_opq":$opq}"""
      }

    // BM25 serve/build split (r15): the sparse-retrieval twin of
    // ann_serve — q_bm25_served timed against a PRE-BUILT term-bucketed
    // postings index over a FIXED ~52-query set, with index construction
    // in the untimed prebuild. The claim under test: sparse serving cost
    // is the query-side work (explode + probe + score + rank), flat-band
    // in corpus size, while the build grows with the corpus — together
    // with ann_serve this measures the FULL hybrid retrieval serving
    // stack's amortized shape. Two corpus sizes at one timed iteration
    // since r18 (cost discipline above). SPARK_GRAFT_SPARSE_SERVE=1
    // forces it on under trimming; "0" disables.
    val sparseServeForced = sys.env.get("SPARK_GRAFT_SPARSE_SERVE").contains("1")
    val sparseServeJson =
      if (!enabled("SPARK_GRAFT_SPARSE_SERVE") ||
          ((only.isDefined || sf1Only.isDefined) && !sparseServeForced)) ""
      else phaseGate("sparse_serve", 520) {  // 450 + the ×50 min-of-2 pass
        // q_phrase_search and q_phrase_slop ride the same pre-built index
        // (their serve branches probe the positional table), so the phase
        // measures exact-phrase AND proximity serving beside BM25 ranking
        val names = Seq("q_bm25_served", "q_phrase_search", "q_phrase_slop")
        val r10 = scalePhase(10, "natural", names, 1,
          withRecall = false, prebuildSparseIndex = true)
        // ×50 back at min-of-2 (r19, verdict ask #2): the r18 one-sample
        // cut made the headline serve point incomparable round-over-round
        // — the driver's ×50 q_phrase_search read 37.3 s contaminated vs
        // r17's 8.8, exactly the 1.5-2× single-sample spread the r18
        // "Not yet optimized" list predicted. Min-of-2 costs ~60 s inside
        // the 180 s window slack the r18 driver run demonstrated; the
        // ×10 point keeps one iteration (it is the cheap bracket end).
        val r50 = scalePhase(50, "natural", names, 2,
          withRecall = false, prebuildSparseIndex = true)
        s""","sparse_serve":{"r10":$r10,"r50":$r50}"""
      }

    // IVF-PQ serve/build split (r14): the natural scale phases conflate
    // index CONSTRUCTION (two Lloyd builds + encode, proportional to
    // corpus) with SERVING (probe + ADC + rank, the amortized per-query
    // cost the 100 TB claim is actually about). This phase times
    // q_ann_ivfpq against a PRE-BUILT index (scalePhase's
    // prebuildAnnIndex seam, mirroring the ingestion store's) over a
    // FIXED 25-query set — the ×10→×50 serve ratio isolates how query
    // cost scales with the indexed corpus when nothing rebuilds.
    // SPARK_GRAFT_ANN_SERVE=1 forces it on under trimming (the
    // probe-phase ABBA convention); "0" disables.
    val annServeForced = sys.env.get("SPARK_GRAFT_ANN_SERVE").contains("1")
    val annServeJson =
      if (!enabled("SPARK_GRAFT_ANN_SERVE") ||
          ((only.isDefined || sf1Only.isDefined) && !annServeForced)) ""
      else phaseGate("ann_serve", 250) {
        // q_ann_filtered rides the same pre-built index (r15): its serve
        // branch pre-filters the codes scan, so the phase also measures
        // the predicate-pushed serving cost next to the unfiltered one
        val names = Seq("q_ann_ivfpq", "q_ann_filtered")
        val r10 = scalePhase(10, "natural", names, 1,
          withRecall = false, prebuildAnnIndex = true)
        // ×50 at min-of-2 (r19, verdict ask #2 — sparse_serve rationale;
        // the ann ×50 serve points are ~1.5 s total, so the second
        // sample costs seconds, not minutes)
        val r50 = scalePhase(50, "natural", names, 2,
          withRecall = false, prebuildAnnIndex = true)
        s""","ann_serve":{"r10":$r10,"r50":$r50}"""
      }

    // sf1 natural scale phase — AFTER the serve phases since r17 (class
    // doc: when the driver's window runs short, the stable recall ladder
    // is the evidence to trade away, not the serving claims).
    val sf1Json =
      if (!enabled("SPARK_GRAFT_SF1") || (only.isDefined && sf1Only.isEmpty)) ""
      else phaseGate("sf1", 500) {
        // SPARK_GRAFT_SF1_REPLICAS widens the base scale probe
        val replicas = sys.env.getOrElse("SPARK_GRAFT_SF1_REPLICAS", "10").toInt
        val names = Sf1Queries.filter(n => sf1Only.forall(_.contains(n)))
        s""","sf1":${scalePhase(replicas, "natural", names, iters, withRecall = true)}"""
      }

    // 20× second scaling point (class doc). Full iteration count (r6):
    // at 2 iters the min-of-2 on the phase's sub-1.5 s flat-scaling
    // queries (session stats, token familiarity) carried enough
    // scheduler noise to invert against their own 10× sibling by
    // ~0.1 s; a third sample tightens the min where marginal data cost
    // is smaller than the noise band.
    val sf20Json =
      if (!enabled("SPARK_GRAFT_SF20") || only.isDefined || sf1Only.isDefined) ""
      else phaseGate("sf20", 400)(
        s""","sf20":${scalePhase(20, "natural", Sf20Queries, iters, withRecall = false)}""")

    // Controlled-pair-volume linearity probe (class doc): jaccard under
    // O(replicas) true pair volume, minhash as the known-linear control,
    // containment (r6) as the no-ratio-prefilter suspect. Join strategy
    // pinned + per-stage candidate counts emitted so the shuffle curve is
    // comparable across replica levels (scalePhase scaladoc).
    // SPARK_GRAFT_PROBE=1 FORCES the phase on even when SPARK_GRAFT_ONLY /
    // SPARK_GRAFT_SF1_ONLY trimmed the rest of the run — the probe is the
    // only view of pure ingestion cost, so a regression flagged there must
    // be re-measurable alone (ABBA protocol) without paying the full
    // engine phase. Unset/other values keep the old behavior (on for full
    // runs, skipped under trimming); "0" disables as before.
    val probeForced = sys.env.get("SPARK_GRAFT_PROBE").contains("1")
    val probeJson =
      if (!enabled("SPARK_GRAFT_PROBE") ||
          ((only.isDefined || sf1Only.isDefined) && !probeForced)) ""
      else phaseGate("probe_controlled", 500) {
        // q_dedup_minhash_incr_fast joins the probe (NOT the natural
        // sf1/sf20 phases) for the same census reason jaccard does: under
        // natural replication every replica of a batch doc is a near-dup
        // of its siblings, so within-batch candidate volume grows
        // quadratically with replica count — a fixture artifact, not
        // operator superlinearity. Controlled mode holds true pair volume
        // at O(replicas), and the phase pre-builds the signature store
        // (bucketed, pre-banded) outside the timed window, so the r10→r20
        // ratio measures exactly the 100 TB claim: ingestion cost scales
        // with the batch, not with history.
        // q_span_maximal (r17) joins the controlled probe for the jaccard
        // census reason: its work is duplication-volume-dependent, and
        // natural replication makes EVERY position a near-full-doc
        // duplicate of its replicas (a fixture census, not operator
        // superlinearity). Controlled salting holds true span volume at
        // O(replicas), so the r10→r20 ratio reads the doubling ladder's
        // own scaling.
        val names = Seq("q_dedup_jaccard", "q_dedup_minhash",
          "q_dedup_containment", "q_dedup_minhash_incr_fast",
          "q_span_maximal")
        val r10 = scalePhase(10, "controlled", names, math.min(iters, 2),
          withRecall = false, fixedJoin = true, jaccardStages = true,
          prebuildIncrStore = true)
        val r20 = scalePhase(20, "controlled", names, math.min(iters, 2),
          withRecall = false, fixedJoin = true, jaccardStages = true,
          prebuildIncrStore = true)
        s""","probe_controlled":{"r10":$r10,"r20":$r20}"""
      }

    // BPE training at production merge counts (r15, the round-14 weak):
    // time the incremental trainer (BpeTrain.trainFast — one corpus
    // aggregate + per-round deltas over only the affected words) at 64
    // and 256 merges, with the distributed per-round-re-encode trainer
    // at 64 as the baseline it replaces. The claim under test is
    // SUB-QUADRATIC round cost: quadratic per-round re-encode work would
    // put t(256)/t(64) near (256/64)² = 16 on the loop alone; the
    // incremental trainer's rounds are independent of how many merges
    // came before, so the ratio should sit near the corpus-pass floor.
    // SPARK_GRAFT_BPE_TRAIN=1 forces it on under trimming; "0" disables.
    val bpeTrainForced = sys.env.get("SPARK_GRAFT_BPE_TRAIN").contains("1")
    val bpeTrainJson =
      if (!enabled("SPARK_GRAFT_BPE_TRAIN") ||
          ((only.isDefined || sf1Only.isDefined) && !bpeTrainForced)) ""
      else phaseGate("bpe_train", 120) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = mkSession()
        // The raw fixture vocabulary is 31 distinct pre-tokens and
        // EXHAUSTS at ~89 merges (measured) — no trainer can learn 256
        // real rules from it. The bench corpus is therefore the fixture
        // text SALTED with its own md5 (deterministic, fixture-derived —
        // ~5k distinct hex words at sf0.1, merge frontier ≫ 1024), so
        // every requested rank is a real merge and the timing measures
        // training, not early exhaustion.
        val docs = graft.sources.Tables.documents(spark, sfDir)
          .select(concat(col("text"), lit(" "),
            md5(concat(col("text"), col("doc_id").cast("string"))))
            .as("text"))
        def fastSec(n: Int): (Double, Long) = {
          val t0 = System.nanoTime()
          val learned = graft.operators.BpeTrain.trainFast(docs, "text", n)
            .collect()
          ((System.nanoTime() - t0) / 1e9, learned.length.toLong)
        }
        val tDist0 = System.nanoTime()
        val dist64 = graft.operators.BpeTrain.train(docs, "text", 64).count()
        val distSec = (System.nanoTime() - tDist0) / 1e9
        graft.operators.Caches.unpersistScope("bpe")
        val (t64, n64) = fastSec(64)
        val (t256, n256) = fastSec(256)
        val (t1024, n1024) = fastSec(1024)
        s""","bpe_train":{"fast64_sec":${r2(t64)},"fast256_sec":${r2(t256)},""" +
          s""""fast1024_sec":${r2(t1024)},"fast_ratio_256_64":${r2(t256 / t64)},""" +
          s""""quadratic_ratio_would_be":16.0,"dist64_sec":${r2(distSec)},""" +
          s""""merges_learned":{"64":$n64,"256":$n256,"1024":$n1024,"dist64":$dist64}}"""
      }

    // Per-stage wall-time breakdown of the incremental near-dup ingestion
    // pair (Dedup.ingestStageTimes) — the profiling evidence behind the
    // md5-vs-xxhash64 family gap: which stage dominates, and whether it is
    // family-dependent (signature build) or shared topology (store join,
    // within-batch candidates, component collapse). Runs once, untimed
    // relative to the engine section. Disable with
    // SPARK_GRAFT_INGEST_STAGES=0.
    val ingestStagesJson =
      if (!enabled("SPARK_GRAFT_INGEST_STAGES") ||
          only.exists(o => !o.exists(_.startsWith("q_dedup_minhash_incr")))) ""
      else phaseGate("ingest_stages", 150) {
        def fmt(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
        val (storeD, batchD) = SparkEntry.incrMinhashCorpus(spark, sfDir)
        // Two passes per family, report the second: the first pass pays
        // whole-stage-codegen compilation for the instrument's own plan
        // shapes (each stage is forced separately, so its generated
        // classes differ from the engine queries'), which is compile
        // bias, not stage cost — the same reasoning as the scale phases'
        // untimed warm-up.
        def run(portable: Boolean, n: Int) =
          graft.operators.Dedup.ingestStageTimes(batchD, "doc_id", "text",
            storeD, numHashes = n, bands = 8, shingleN = 5,
            minEstJaccard = 0.3, portable = portable)
        run(portable = false, 32); run(portable = true, 16)
        val fast = run(portable = false, 32)
        val md5 = run(portable = true, 16)
        s""","ingest_stages":{"fast":${fmt(fast)},"portable":${fmt(md5)}}"""
      }

    // Funnel→audit sharing instrument (r11): both operators build through
    // ONE curationFrames core — tracked frames substitute through the
    // CacheManager and the components result memoizes under the
    // canonicalized pair-plan key — so a caller running funnel THEN audit
    // pays the pipeline once. Measure exactly that claim: funnel cold,
    // audit WITHOUT releasing the shared caches (should cost a small
    // fraction of cold), audit cold for reference. The engine section's
    // per-query numbers are unaffected (it releases everything between
    // queries — this instrument runs outside it, untimed relative to the
    // section). Disable with SPARK_GRAFT_FUNNEL_AUDIT=0.
    val funnelAuditJson =
      if (!enabled("SPARK_GRAFT_FUNNEL_AUDIT") ||
          only.exists(o => !o.contains("q_corpus_drop_audit"))) ""
      else phaseGate("funnel_then_audit", 120) {
        def run(name: String): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        def release(): Unit = {
          spark.catalog.clearCache()
          graft.operators.Caches.unpersistAll()
          System.gc()
        }
        // untimed warm pass: codegen/JIT of both plans is compile bias
        run("q_corpus_funnel_neardup"); run("q_corpus_drop_audit"); release()
        val funnelSec = run("q_corpus_funnel_neardup")
        val auditSharedSec = run("q_corpus_drop_audit") // caches NOT released
        release()
        val auditColdSec = run("q_corpus_drop_audit")
        release()
        s""","funnel_then_audit":{"funnel_sec":${r2(funnelSec)},""" +
          s""""audit_shared_sec":${r2(auditSharedSec)},""" +
          s""""audit_cold_sec":${r2(auditColdSec)}}"""
      }

    // Cross-phase inversion report (phaseMins scaladoc): every shared
    // query whose min at the SMALLER natural scale exceeds its min at the
    // LARGER — impossible on clean numbers, so each listed entry marks
    // residual measurement noise (uniform-slowdown contamination the
    // bracketing sentinel cannot see) and its magnitude. Empty = the two
    // scale points are mutually consistent.
    var nInversions = 0
    val scaleInversions = {
      val nat = phaseMins.collect { case (k, m) if k.endsWith("_natural") =>
        k.stripPrefix("x").stripSuffix("_natural").toInt -> m
      }.toSeq.sortBy(_._1)
      if (nat.size < 2) ""
      else {
        val (rLo, lo) = nat.head
        val (rHi, hi) = nat.last
        val inv = (lo.keySet & hi.keySet).toSeq.sorted.collect {
          case q if lo(q) > hi(q) =>
            s""""$q":{"x${rLo}_min":${r2(lo(q))},"x${rHi}_min":${r2(hi(q))},"ratio":${r2(lo(q) / hi(q))}}"""
        }
        nInversions = inv.size
        s""","scale_inversions":${inv.mkString("{", ",", "}")}"""
      }
    }

    val curveJson = lastCurve
      .map(c => s""","recall_curve_sf1":$c""").getOrElse("")
    val skipped = skippedPhases.result()
    val budgetJson =
      s""","budget_sec":${r2(budgetSec)},"elapsed_sec":${r2(budgetSec - budgetLeft)},""" +
        s""""gate_drift":${r2(gateDrift)},""" +
        s""""skipped_phases":${skipped.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,$engineSection,"sf":"$sfDir"$ingestStagesJson$funnelAuditJson$streamingJson$sf1Json$sf20Json$probeJson$annServeJson$sparseServeJson$opqAnisoJson$bpeTrainJson$scaleInversions$curveJson$budgetJson}"""
    // Marker-prefixed line FIRST: the driver's artifact parser reads the
    // structured payload from `BENCH_JSON: {...}` without depending on
    // stdout tail ordering (r4/r5 artifacts carried parsed:null because
    // the bare line was lost to tail truncation).
    println(s"BENCH_JSON: $line")
    println(line)
    // Also persist the full line ATOMICALLY (write-then-move): the file is
    // the complete record even if the run is killed mid-write.
    //
    // Scrap-path rule (r14): a PARTIAL run — query subsets (SPARK_GRAFT_
    // ONLY / _SF1_ONLY), any phase gated off, or a forced probe — must
    // never land on the committed artifact path by default: r13's final
    // artifact was clobbered by a one-query ONLY run writing the default
    // bench_out.json (commit 83c91be), leaving a 1-query scrap at HEAD.
    // Only a full run defaults to bench_out.json; partial runs default to
    // /tmp. An explicit SPARK_GRAFT_BENCH_OUT always wins.
    val partialRun = only.isDefined || sf1Only.isDefined || probeForced ||
      annServeForced || bpeTrainForced || sparseServeForced ||
      opqAnisoForced ||
      Seq("SPARK_GRAFT_SF1", "SPARK_GRAFT_SF20", "SPARK_GRAFT_PROBE",
        "SPARK_GRAFT_INGEST_STAGES", "SPARK_GRAFT_FUNNEL_AUDIT",
        "SPARK_GRAFT_ANN_SERVE", "SPARK_GRAFT_BPE_TRAIN",
        "SPARK_GRAFT_SPARSE_SERVE", "SPARK_GRAFT_OPQ_ANISO")
        .exists(k => sys.env.get(k).contains("0"))
    val defaultOut =
      if (partialRun) "/tmp/graft_bench_scrap.json" else "bench_out.json"
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut))
      val tmp = java.nio.file.Paths.get(out.toString + ".tmp")
      java.nio.file.Files.writeString(tmp, line + "\n")
      java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    // Compact (<1 KB) summary as the LAST stdout line: the driver's tail
    // window is ~2 KB and the full BENCH_JSON line exceeds it (r4-r7
    // artifacts carried parsed:null). Everything adjudication needs at a
    // glance. Scope discipline: total/n_queries/n_failed/contaminated_n
    // all describe the ENGINE section (one consistent denominator);
    // failures anywhere else (streaming, scale phases) surface separately
    // as n_failed_other so a crashed phase can't be misread as a crashed
    // engine query — or hide.
    val recallJson = lastRecall
      .map(m => s""","recall_srp":${m("q_ann_srp")},"recall_ivf":${m("q_ann_ivf")},""" +
        s""""recall_pq":${m("q_ann_pq")},"recall_ivfpq":${m("q_ann_ivfpq")},""" +
        s""""recall_ivfpq_rr":${m("q_ann_ivfpq_rerank")},""" +
        s""""recall_ivfpq_rr16":${m("q_ann_ivfpq_rerank16")},""" +
        s""""recall_opq":${m("q_ann_opq")}""")
      .getOrElse("")
    val nFailedOther = nFailedTotal - engine.nFailed
    println(s"""BENCH_SUMMARY: {"total":${r2(total)},"n_queries":${engine.nOk},""" +
      s""""n_failed":${engine.nFailed},"n_failed_other":$nFailedOther,""" +
      s""""contaminated_n":${engine.nContaminated},""" +
      s""""resampled_n":${engine.nResampled},""" +
      s""""skipped_phases_n":${skipped.size},""" +
      s""""inversions_n":$nInversions$recallJson,"sf":"$sfDir"}""")
    // Bare spec-shaped JSON as the final program line (<2 KB): the
    // driver's artifact parser reads a 2 KB stdout tail, and every prior
    // round's BENCH_r*.json carried parsed:null because the only bare
    // JSON line (the full record above) exceeds the window. `queries`
    // carries the HEADLINE subset — the costliest engine mins — with the
    // full per-query record in bench_out.json. Paired with the sbt
    // StdoutOutput strategy in build.sbt, this line reaches the driver
    // verbatim (no "[info] " framing).
    // same union as the early flush (verdict ask #7 — no phantom drops)
    val headline = headlineJson(engine.mins)
    println(s"""{"metric":"engine_total","value":${r2(total)},"unit":"sec",""" +
      s""""queries":{$headline},"sf":"$sfDir","n_queries":${engine.nOk},""" +
      s""""n_failed":${engine.nFailed},"n_failed_other":$nFailedOther,""" +
      s""""contaminated_n":${engine.nContaminated},"iters":$iters}""")
    spark.stop()
  }
}
