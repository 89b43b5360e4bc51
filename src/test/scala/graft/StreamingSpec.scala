package graft

import java.sql.Timestamp
import graft.streaming.StreamingPatterns
import graft.streaming.StreamingPatterns.{LogEvent, PatternState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(q: String, user: String, tMin: Int, dur: Double) =
    LogEvent(q, user, new Timestamp(1700000000000L + tMin * 60000L), dur, 100L)

  test("stateful pattern agg accumulates across micro-batches (A6 as streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogEvent]
    val q = StreamingPatterns.statefulPatterns(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("pattern_state").start()
    try {
      input.addData(ev("SELECT a FROM t WHERE x = 1", "alice", 0, 100),
        ev("SELECT a FROM t WHERE x = 2", "bob", 5, 200))
      q.processAllAvailable()
      input.addData(ev("SELECT a FROM t WHERE x = 3", "alice", 10, 300))
      q.processAllAvailable()
      val state = spark.table("pattern_state").as[PatternState].collect()
        .groupBy(_.pattern_id).map { case (k, v) => k -> v.maxBy(_.frequency) }
      assert(state.size == 1) // one normalized pattern
      val s = state.values.head
      assert(s.frequency == 3L)
      assert(s.total_duration_ms == 600.0)
      assert(s.users == Set("alice", "bob"))
      assert(s.first_seen.getTime == 1700000000000L)
      assert(s.last_seen.getTime == 1700000000000L + 600000L)
    } finally q.stop()
  }

  test("streaming ingestion through the bucketed history equals the batch aggregate") {
    import graft.operators.{Patterns, PatternStore}
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val t = "pat_hist_stream"
    spark.sql(s"DROP TABLE IF EXISTS $t"); spark.sql(s"DROP TABLE IF EXISTS ${t}_staging")
    def asLogs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pattern_id", graft.functions.Normalize.fingerprint(col("query")))
      .withColumn("read_rows", lit(1L))
      .withColumn("read_bytes", lit(10L))
    val input = MemoryStream[LogEvent]
    // foreachBatch: per micro-batch partial aggregate, then the additive
    // upsert into the bucketed store — disjoint batches ⇒ exact
    val q = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[LogEvent], _: Long) =>
        PatternStore.enrichBucketed(
          batch.sparkSession, Patterns.aggregate(asLogs(batch.toDF())), t,
          numBuckets = 4)
        ()
      }.start()
    try {
      input.addData(ev("SELECT a FROM t WHERE x = 1", "alice", 0, 100),
        ev("SELECT b FROM u WHERE y = 9", "bob", 5, 200))
      q.processAllAvailable()
      input.addData(ev("SELECT a FROM t WHERE x = 3", "carol", 10, 300),
        ev("SELECT b FROM u WHERE y = 1", "alice", 15, 50))
      q.processAllAvailable()
      val all = Seq(
        ev("SELECT a FROM t WHERE x = 1", "alice", 0, 100),
        ev("SELECT b FROM u WHERE y = 9", "bob", 5, 200),
        ev("SELECT a FROM t WHERE x = 3", "carol", 10, 300),
        ev("SELECT b FROM u WHERE y = 1", "alice", 15, 50)).toDS()
      val cols = Patterns.aggregate(asLogs(all.toDF())).columns.map(col)
      val expected = Patterns.aggregate(asLogs(all.toDF()))
        .orderBy("pattern_id").collect().toSeq
      val got = spark.table(t).select(cols: _*)
        .orderBy("pattern_id").collect().toSeq
      assert(got == expected)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_staging")
    }
  }

  test("stream-stream interval join bounds both state stores by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val qs = MemoryStream[(Long, Timestamp, String)] // (user, time, query)
    val ctx = MemoryStream[(Long, Timestamp, String)] // (user, time, context)
    val joined = StreamingPatterns.intervalJoin(
      qs.toDS().toDF("q_user", "q_time", "q_query"),
      ctx.toDS().toDF("c_user", "c_time", "c_context"),
      leftKey = "q_user", rightKey = "c_user",
      leftTime = "q_time", rightTime = "c_time",
      leftWatermark = "10 minutes", rightWatermark = "10 minutes",
      lookBehind = "5 minutes", lookAhead = "0 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("interval_join").start()
    try {
      def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
      ctx.addData((1L, t(0), "session_start"), (2L, t(0), "session_start"))
      qs.addData((1L, t(3), "SELECT 1"),  // 3 min after ctx: within 5-min look-behind
        (1L, t(9), "SELECT 2"),           // 9 min after: outside
        (3L, t(3), "SELECT 3"))           // no ctx for user 3
      q.processAllAvailable()
      val rows = spark.table("interval_join").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("q_query") == "SELECT 1")
      assert(rows.head.getAs[String]("c_context") == "session_start")
    } finally q.stop()
  }

  test("update transition mirrors batch merge semantics") {
    val s0 = StreamingPatterns.emptyState("p")
    val s1 = StreamingPatterns.updateState(s0,
      Iterator(ev("q", "u1", 0, 10), ev("q", "u2", 2, 20)))
    val s2 = StreamingPatterns.updateState(s1, Iterator(ev("q", "u1", 1, 5)))
    assert(s2.frequency == 3 && s2.total_duration_ms == 35.0)
    assert(s2.users == Set("u1", "u2"))
    assert(s2.first_seen.getTime < s2.last_seen.getTime)
  }

  test("streaming dedup drops duplicates and bounds state by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogEvent]
    val q = StreamingPatterns.streamingDedup(input.toDF(),
      Seq("query", "user"), "query_start_time", "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_dedup").start()
    try {
      input.addData(ev("SELECT 1", "u1", 0, 10), ev("SELECT 1", "u1", 1, 10),
        ev("SELECT 1", "u2", 2, 10))
      q.processAllAvailable()
      // duplicate (query,user) within the horizon dropped; distinct kept
      assert(spark.table("stream_dedup").count() == 2)
    } finally q.stop()
  }

  test("expiring stateful patterns emit finals on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogEvent]
    val q = StreamingPatterns.expiringPatterns(input.toDS(),
      watermark = "10 minutes", idleGapMs = 600000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("expiring").start()
    try {
      input.addData(ev("SELECT a FROM t WHERE x = 1", "alice", 0, 100),
        ev("SELECT a FROM t WHERE x = 2", "bob", 2, 200))
      q.processAllAvailable()
      assert(spark.table("expiring").count() == 0) // nothing expired yet
      // jump event time far ahead: watermark passes the idle timeout
      input.addData(ev("SELECT b FROM other", "carol", 180, 5))
      q.processAllAvailable()
      input.addData(ev("SELECT b FROM other", "carol", 181, 5))
      q.processAllAvailable()
      val finals = spark.table("expiring").as[PatternState].collect()
      assert(finals.length == 1) // the first pattern, closed out
      assert(finals.head.frequency == 2L)
      assert(finals.head.users == Set("alice", "bob"))
    } finally q.stop()
  }

  test("streaming near-dup ingestion equals the batch twin across micro-batches") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sigT = "ingest_sigs_stream"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")
    val keptIds = scala.collection.mutable.Set.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        keptIds ++= Dedup.ingestMinhash(batch.sparkSession, batch,
          "doc_id", "text", sigT, epochId = Some(epoch)).select("doc_id")
          .collect().map(_.getLong(0))
        graft.operators.Caches.unpersistScope("dedup")
        ()
      }.start()
    try {
      // batch 1: two distinct docs + a near-copy of the first
      input.addData((1L, sent("alpha")), (2L, sent("beta")),
        (3L, dropLast(sent("alpha"))))
      q.processAllAvailable()
      // batch 2: near-copies of batch-1 SURVIVORS (cross-batch store
      // rejection) + one genuinely new doc
      input.addData((4L, dropLast(sent("beta"))), (5L, sent("gamma")))
      q.processAllAvailable()
      assert(keptIds.toSet == Set(1L, 2L, 5L), keptIds.toString)
      // batch twin over the union with an empty store: same keep set
      // (ids arrive in increasing order, so first-seen == min-id)
      val all = Seq((1L, sent("alpha")), (2L, sent("beta")),
        (3L, dropLast(sent("alpha"))), (4L, dropLast(sent("beta"))),
        (5L, sent("gamma"))).toDF("doc_id", "text")
      val emptyStore = Dedup.minhashSignaturesPortable(
        all.limit(0), "doc_id", "text")
      val oneShot = Dedup.newAgainstStoreMinhash(all, "doc_id", "text",
        emptyStore).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(oneShot == keptIds.toSet, s"one-shot=$oneShot stream=$keptIds")
      // the signature store grew by survivors only
      assert(spark.table(sigT).count() == 3L)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $sigT")
    }
  }

  test("streaming ANN index ingest: micro-batch encode == batch encode (map-only, no state)") {
    // the q_ann_index_append composition's STREAMING twin: servingCodes
    // is one stateless map-only pass against literal codebooks, so it
    // runs under Structured Streaming unchanged — a vector firehose
    // appends straight into the serving index with no watermark, no
    // state store, and per-row identity with the batch encoder
    import graft.operators.{Ivf, Pq}
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val old = emb.filter(col("vec_id") % 10 =!= 9)
    val (_, cents) = Ivf.build(old, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.build(old, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Pq.servingCodes(input.toDS().toDF("vec_id", "embedding"),
        "vec_id", "embedding", cb, cents, m = 8, dim = 64)
      .writeStream.format("memory").queryName("ann_codes_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val batchRows = emb.filter(col("vec_id") % 10 === 9)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
          r.getInt(2))).sortBy(_._1).toSeq
      val got = norm(spark.table("ann_codes_stream"))
      val want = norm(Pq.servingCodes(emb.filter(col("vec_id") % 10 === 9),
        "vec_id", "embedding", cb, cents, m = 8, dim = 64))
      assert(got.nonEmpty && got == want)
    } finally {
      q.stop()
      graft.operators.Caches.unpersistScope("pq")
      graft.operators.Caches.unpersistScope("ivf")
    }
  }

  test("streaming BM25 postings ingest: micro-batch postings == batch postings") {
    // the sparse index's streaming-append twin (Tfidf.postingsRowLocal
    // scaladoc): tf is a per-document quantity computed within the row,
    // so a document firehose appends straight into the postings table —
    // stateless map-only, no watermark, no state store, per-row identity
    // with the batch build's shuffle-aggregated postings
    import graft.operators.Tfidf
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Tfidf.postingsRowLocal(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("bm25_postings_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = Seq((1L, "red fox red fox dog"), (2L, "lazy dog"),
        (3L, "dog dog dog"), (4L, "quick brown fox"))
      val (b1, b2) = docs.splitAt(2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val got = norm(spark.table("bm25_postings_stream"))
      import spark.implicits._
      val want = norm(Tfidf.buildBm25Index(
        docs.toDF("doc_id", "text"), "doc_id", "text").postings)
      assert(got.nonEmpty && got == want, got.mkString("\n"))
    } finally {
      q.stop()
      graft.operators.Caches.unpersistScope("tfidf")
    }
  }

  test("streaming BM25 index lifecycle: load→append→save per micro-batch equals the rebuild, replay included") {
    // the FULL maintenance loop (r18, the r17 verdict's ask #6): each
    // micro-batch appends into the PERSISTED index through the staged
    // swap, and a replayed batch (at-least-once delivery) anti-joins to
    // nothing — any batching of the stream lands on the identical index
    import graft.operators.Tfidf
    implicit val sqlCtx = spark.sqlContext
    val p = "graft_stream_idx_spec"
    val members = Seq(s"${p}_postings", s"${p}_termstats", s"${p}_corpusstats")
    val existing = Seq((1L, "red fox jumps"), (2L, "lazy dog sleeps"))
    val batch1 = Seq((3L, "red dog barks"), (4L, "quick brown fox"))
    val batch2 = Seq((5L, "dog dog dog"))
    try {
      Tfidf.saveBm25Index(
        Tfidf.buildBm25Index(existing.toDF("doc_id", "text"),
          "doc_id", "text"), p, buckets = 2)
      val input = MemoryStream[(Long, String)]
      val q = input.toDS().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          Tfidf.saveBm25Index(
            Tfidf.appendBm25Index(Tfidf.loadBm25Index(spark, p), b.toDF(),
              "doc_id", "text"), p, buckets = 2)
          ()
        }.start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        input.addData(batch1); q.processAllAvailable() // replayed delivery
      } finally q.stop()
      val got = Tfidf.loadBm25Index(spark, p)
      val want = Tfidf.buildBm25Index(
        (existing ++ batch1 ++ batch2).toDF("doc_id", "text"),
        "doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSeq
          .sortBy(_.mkString(" "))
      assert(rows(got.postings.select("term", "doc", "tf", "dl")) ==
        rows(want.postings.select("term", "doc", "tf", "dl")))
      assert(rows(got.termStats.select("term", "df")) ==
        rows(want.termStats.select("term", "df")))
      assert(rows(got.corpusStats) == rows(want.corpusStats))
    } finally {
      members.foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        spark.sql(s"DROP TABLE IF EXISTS `${t}__stage`")
        spark.sql(s"DROP TABLE IF EXISTS `${t}__swapcommit`")
      }
      graft.operators.Caches.unpersistScope("tfidf")
    }
  }

  test("ingestion replaying an epoch keeps the same set and appends no duplicate signatures") {
    import graft.operators.Dedup
    val sigT = "ingest_sigs_replay"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")
    try {
      val b0 = Seq((1L, sent("alpha")), (2L, sent("beta")),
        (3L, dropLast(sent("alpha")))).toDF("doc_id", "text")
      def runEpoch(df: org.apache.spark.sql.DataFrame, e: Long) =
        Dedup.ingestMinhashFast(spark, df, "doc_id", "text", sigT,
          epochId = Some(e)).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(runEpoch(b0, 0L) == Set(1L, 2L))
      assert(spark.table(sigT).count() == 2L)
      // at-least-once replay of the SAME epoch: the prior append must not
      // self-reject the batch, and nothing may double-append
      assert(runEpoch(b0, 0L) == Set(1L, 2L))
      assert(spark.table(sigT).count() == 2L)
      // a later epoch sees epoch-0 history: store near-dups rejected
      val b1 = Seq((4L, dropLast(sent("beta"))), (5L, sent("gamma")))
        .toDF("doc_id", "text")
      assert(runEpoch(b1, 1L) == Set(5L))
      assert(spark.table(sigT).count() == 3L)
      // replaying epoch 1 is idempotent too
      assert(runEpoch(b1, 1L) == Set(5L))
      assert(spark.table(sigT).count() == 3L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("replay overwrites a partially committed epoch instead of trusting it") {
    import graft.operators.Dedup
    val sigT = "ingest_sigs_partial"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    try {
      def runEpoch(df: org.apache.spark.sql.DataFrame, e: Long) =
        Dedup.ingestMinhashFast(spark, df, "doc_id", "text", sigT,
          epochId = Some(e)).select("doc_id").collect().map(_.getLong(0)).toSet
      // simulate a prior attempt that crashed after committing only doc
      // 1's signature for epoch 0 (non-atomic committer partial output)
      runEpoch(Seq((1L, sent("alpha"))).toDF("doc_id", "text"), 0L)
      assert(spark.table(sigT).count() == 1L)
      // the replay delivers the FULL epoch-0 batch: the epoch partition
      // must be rewritten whole — doc 2's signature recovered, doc 1's
      // not duplicated (the old skip-if-present guard lost doc 2 forever)
      val replayed = runEpoch(
        Seq((1L, sent("alpha")), (2L, sent("beta"))).toDF("doc_id", "text"), 0L)
      assert(replayed == Set(1L, 2L))
      assert(spark.table(sigT).count() == 2L)
      assert(spark.table(sigT)
        .filter(org.apache.spark.sql.functions.col("epoch") === 0L)
        .count() == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("compaction bounds store partitions and preserves rejection and replay above the watermark") {
    import graft.operators.Dedup
    val sigT = "ingest_sigs_compact"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")
    try {
      def batch(e: Long) = Seq((e, sent(s"w$e"))).toDF("doc_id", "text")
      def runEpoch(df: org.apache.spark.sql.DataFrame, e: Long) =
        Dedup.ingestMinhashFast(spark, df, "doc_id", "text", sigT,
          epochId = Some(e)).select("doc_id").collect().map(_.getLong(0)).toSet
      // ten micro-batches → ten epoch partitions
      (0L to 9L).foreach(e => assert(runEpoch(batch(e), e) == Set(e)))
      assert(spark.table(sigT).select("epoch").distinct().count() == 10L)
      assert(spark.table(sigT).count() == 10L)
      // compact everything the checkpoint can no longer re-deliver
      Dedup.compactSignatureStore(spark, sigT, 8L)
      val eps = spark.table(sigT).select("epoch").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(eps == Set(-1L, 8L, 9L), eps.toString)
      assert(spark.table(sigT).count() == 10L)
      // rejection against compacted history is unchanged: a near-dup of
      // epoch-3's doc (now in the -1 partition) is still dropped
      assert(runEpoch(Seq((100L, dropLast(sent("w3"))))
        .toDF("doc_id", "text"), 10L).isEmpty)
      // replaying an epoch at/above the watermark stays idempotent
      assert(runEpoch(batch(9L), 9L) == Set(9L))
      assert(spark.table(sigT).count() == 10L)
      // compaction is re-runnable after success (epochs already folded)
      Dedup.compactSignatureStore(spark, sigT, 8L)
      assert(spark.table(sigT).count() == 10L)
      // CRASH-HEAL path: simulate a prior compaction that wrote the -1
      // partition but died before dropping a source epoch — doc 3's
      // signature visible in BOTH -1 and a resurrected epoch 3. Re-running
      // must fold without baking the duplicate into -1.
      val fns = org.apache.spark.sql.functions
      // resurrect epoch 3 FIRST (reading -1's single doc-3 row), then
      // duplicate inside -1 — each append reads the pre-mutation row once
      spark.table(sigT).filter(fns.col("epoch") === -1L && fns.col("doc") === 3L)
        .select(fns.col("doc"), fns.col("sig"))
        .withColumn("epoch", fns.lit(3L))
        .write.mode("append").insertInto(sigT)
      spark.table(sigT).filter(fns.col("epoch") === -1L && fns.col("doc") === 3L)
        .write.mode("append").insertInto(sigT)
      assert(spark.table(sigT).count() == 12L) // dup in -1 AND a stale epoch
      Dedup.compactSignatureStore(spark, sigT, 8L)
      assert(spark.table(sigT).count() == 10L, "heal left duplicates")
      assert(spark.table(sigT).select("epoch").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-1L, 8L, 9L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("an externally created unpartitioned epoch store is never wholesale-overwritten") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, lit}
    val sigT = "ingest_sigs_flat"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    try {
      // 3-column epoch-capable store created WITHOUT partitionBy — the
      // layout an external tool might materialize
      Dedup.minhashSignatures(
          Seq((1L, sent("alpha"))).toDF("doc_id", "text"), "doc_id", "text")
        .withColumn("epoch", lit(0L))
        .write.saveAsTable(sigT)
      def runEpoch(df: org.apache.spark.sql.DataFrame, e: Long) =
        Dedup.ingestMinhashFast(spark, df, "doc_id", "text", sigT,
          epochId = Some(e)).select("doc_id").collect().map(_.getLong(0)).toSet
      // a dynamic overwrite on an unpartitioned table would have replaced
      // the WHOLE table here; the fallback must append instead
      assert(runEpoch(Seq((2L, sent("beta"))).toDF("doc_id", "text"), 1L)
        == Set(2L))
      assert(spark.table(sigT).count() == 2L)
      assert(spark.table(sigT).filter(col("epoch") === 0L).count() == 1L)
      // replay of the same epoch: append-if-absent, no duplicate rows
      assert(runEpoch(Seq((2L, sent("beta"))).toDF("doc_id", "text"), 1L)
        == Set(2L))
      assert(spark.table(sigT).count() == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("compaction refuses an unpartitioned epoch-capable store by name") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.lit
    val sigT = "ingest_sigs_flat_compact"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    try {
      // epoch COLUMN present but no partitioning: a dynamic overwrite
      // would replace the whole table with only the pre-watermark rows,
      // silently destroying every epoch >= upToEpoch
      Dedup.minhashSignatures(
          Seq((1L, sent("alpha")), (2L, sent("beta"))).toDF("doc_id", "text"),
          "doc_id", "text")
        .withColumn("epoch", lit(0L))
        .write.saveAsTable(sigT)
      val e = intercept[IllegalArgumentException] {
        Dedup.compactSignatureStore(spark, sigT, 1L)
      }
      assert(e.getMessage.contains("partitioned by epoch"), e.getMessage)
      // and nothing was written: both rows still present
      assert(spark.table(sigT).count() == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("compaction interleaved with live ingestion preserves keep sets and replay idempotence") {
    import graft.operators.Dedup
    val sigT = "ingest_sigs_interleave"
    val ctlT = "ingest_sigs_interleave_ctl"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    spark.sql(s"DROP TABLE IF EXISTS $ctlT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")
    try {
      // each epoch carries one fresh doc and one near-dup of the PREVIOUS
      // epoch's fresh doc, so every rejection exercises history visibility
      def batch(e: Long) = Seq(
        (10 * e, sent(s"w$e")),
        (10 * e + 1, dropLast(sent(s"w${e - 1}")))).toDF("doc_id", "text")
      def runEpoch(t: String)(df: org.apache.spark.sql.DataFrame, e: Long) =
        Dedup.ingestMinhashFast(spark, df, "doc_id", "text", t,
          epochId = Some(e)).select("doc_id").collect().map(_.getLong(0)).toSet
      // epochs 0..4 land identically on the compacted store and the
      // never-compacted control
      (0L to 4L).foreach { e =>
        val k = runEpoch(sigT)(batch(e), e)
        assert(k == runEpoch(ctlT)(batch(e), e))
        assert(k == (if (e == 0) Set(0L, 1L) else Set(10 * e)))
      }
      // watermark contract: epoch 5 is in flight, so compact through 5
      // (folds 0..4 only; 5's partition never exists yet, and would be
      // untouched if it did)
      Dedup.compactSignatureStore(spark, sigT, 5L)
      val k5 = runEpoch(sigT)(batch(5L), 5L)
      assert(k5 == runEpoch(ctlT)(batch(5L), 5L))
      assert(k5 == Set(50L)) // 51 rejected against the folded epoch-4 doc
      // re-compact while 5 is replayable, then replay 5: identical keep
      // set, no duplicate signatures
      Dedup.compactSignatureStore(spark, sigT, 5L)
      assert(runEpoch(sigT)(batch(5L), 5L) == k5)
      assert(spark.table(sigT).count() == spark.table(ctlT).count())
      assert(spark.table(sigT).select("epoch").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-1L, 5L))
      // the next live epoch sees the same visible history on both stores
      assert(runEpoch(sigT)(batch(6L), 6L) == runEpoch(ctlT)(batch(6L), 6L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $sigT")
      spark.sql(s"DROP TABLE IF EXISTS $ctlT")
    }
  }

  test("ingestion appends to a pre-epoch two-column store without crashing") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val sigT = "ingest_sigs_legacy"
    spark.sql(s"DROP TABLE IF EXISTS $sigT")
    def sent(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    try {
      // a store written by the pre-epoch release: (doc, sig) only
      Dedup.minhashSignaturesPortable(
          Seq((1L, sent("alpha"))).toDF("doc_id", "text"), "doc_id", "text")
        .write.saveAsTable(sigT)
      val batch = Seq((2L, sent("beta"))).toDF("doc_id", "text")
      // epoch-aware call against the legacy table: must dedup AND append
      // (2 columns, no epoch) instead of dying on a schema mismatch
      val kept = Dedup.ingestMinhash(spark, batch, "doc_id", "text", sigT,
        epochId = Some(7L)).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L))
      assert(spark.table(sigT).count() == 2L)
      assert(!spark.table(sigT).columns.contains("epoch"))
      // near-dup of the legacy store row is still rejected
      val rejected = Dedup.ingestMinhash(spark, Seq(
          (3L, sent("alpha").split(" ").dropRight(1).mkString(" ")))
          .toDF("doc_id", "text"), "doc_id", "text", sigT, epochId = Some(8L))
        .count()
      assert(rejected == 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $sigT")
  }

  test("windowed watermarked stats over a bounded stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogEvent]
    val q = StreamingPatterns.windowedPatternStats(input.toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("windowed").start()
    try {
      input.addData(ev("SELECT 1 FROM a", "u", 0, 10), ev("SELECT 2 FROM a", "u", 1, 10),
        ev("SELECT 9 FROM b", "u", 15, 10))
      q.processAllAvailable()
      val rows = spark.table("windowed").collect()
      // pattern a: two events in window [0,10); pattern b: one in [10,20)
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("frequency")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming group cap equals batch groupCap under any batching, order, and redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val all = (1L to 40L).map(i => (i, s"dom${i % 3}"))
    val batchKeep = graft.operators.Sampling.groupCap(
      all.toDF("doc_id", "domain"), "doc_id", "domain", n = 4)
      .select("doc_id", "domain").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def finalKept(batches: Seq[Seq[(Long, String)]]): Set[(Long, String)] = {
      val input = MemoryStream[(Long, String)]
      val name = s"cap_stream_${math.abs(batches.hashCode)}"
      val q = StreamingPatterns.streamingGroupCap(
        input.toDF().toDF("doc_id", "domain"), "doc_id", "domain", n = 4)
        .toDF("domain", "doc_id")
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName(name).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        // The update-mode memory sink appends every emission (it has no
        // upsert key), so derive each group's FINAL state set-theoretically:
        // any id in the final least-n was emitted the batch it arrived
        // (membership in the global least-n implies membership in every
        // containing subset's least-n), so the final set per group is the
        // md5-least n of everything that group ever emitted. The ranking
        // here is an INDEPENDENT md5 (commons-codec, not Spark's), and the
        // result is cross-checked against the batch operator's answer.
        val rows = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        rows.groupBy(_._1).flatMap { case (g, rs) =>
          rs.map(_._2).distinct
            .sortBy(id => (org.apache.commons.codec.digest.DigestUtils
              .md5Hex(s"cap:$id"), id)).take(4)
            .map(id => (id, g))
        }.toSet
      } finally q.stop()
    }
    // one batch, natural order
    assert(finalKept(Seq(all)) == batchKeep)
    // three adversarial batches, reversed order
    val rev = all.reverse
    assert(finalKept(Seq(rev.take(13), rev.slice(13, 27), rev.drop(27)))
      == batchKeep)
    // redelivery: second batch repeats the first entirely
    assert(finalKept(Seq(all.take(20), all.take(20), all.drop(20)))
      == batchKeep)
  }

  test("session_window merges at exactly the gap and splits strictly after it") {
    import org.apache.spark.sql.functions._
    // the semantic pin the q_stream_sessionize oracle relies on: an event
    // at EXACTLY prev + gap still merges (the window boundary is
    // inclusive for merging — split only at gap > 1 h, the same strictly-
    // after rule as the batch lag operator), and session end = last
    // event + gap
    val df = Seq((1L, 0L), (1L, 3600000L), (2L, 0L), (2L, 3599999L),
        (3L, 0L), (3L, 3600001L))
      .toDF("u", "ms").withColumn("ts", timestamp_millis(col("ms")))
    val rows = df.groupBy(session_window(col("ts"), "1 hour"), col("u"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), unix_millis(col("session_window.start")).as("st"),
        unix_millis(col("session_window.end")).as("en"), col("n"))
      .orderBy(col("u"), col("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 7200000L, 2L),
      (2L, 0L, 7199999L, 2L),
      (3L, 0L, 3600000L, 1L), (3L, 3600001L, 7200001L, 1L)), rows.mkString(";"))
  }

  test("streaming session_window in complete mode equals the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // adversarial batching: a session's events split across micro-batches
    // and arrive out of order — complete mode must still merge them
    val events = Seq((1L, 0L), (1L, 1000L), (1L, 3599000L), (1L, 7200000L),
      (2L, 500L), (2L, 3600499L), (2L, 10000000L))
    def batch(rows: Seq[(Long, Long)]) = rows.toDF("u", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val expected = batch(events)
      .groupBy(session_window(col("ts"), "1 hour"), col("u"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), unix_millis(col("session_window.start")).as("st"),
        unix_millis(col("session_window.end")).as("en"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("u", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .groupBy(session_window(col("ts"), "1 hour"), col("u"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_sessions").start()
    try {
      // reversed order, split mid-session
      val rev = events.reverse
      input.addData(rev.take(3): _*); q.processAllAvailable()
      input.addData(rev.drop(3): _*); q.processAllAvailable()
      val got = spark.table("stream_sessions")
        .select(col("u"), unix_millis(col("session_window.start")).as("st"),
          unix_millis(col("session_window.end")).as("en"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"streaming $got vs batch $expected")
    } finally q.stop()
  }

  test("group cap idleRetention evicts idle groups: a reappearing group restarts its cap") {
    implicit val sqlCtx = spark.sqlContext
    // md5-rank of group a's candidates, independent implementation
    val aIds = (1L to 5L)
    val ranked = aIds.sortBy(id => (org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"cap:$id"), id))
    val (kept2, loser) = (ranked.take(2), ranked(2))
    val input = MemoryStream[(Long, String)]
    val q = StreamingPatterns.streamingGroupCap(
      input.toDF().toDF("doc_id", "domain"), "doc_id", "domain", n = 2,
      idleRetention = Some("1 millisecond"))
      .toDF("domain", "doc_id")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cap_evict").start()
    // With ProcessingTimeTimeout the engine NEVER quiesces (every batch
    // "requires another" to honor future timeouts), so processAllAvailable
    // would hang forever — poll the sink against a deadline instead.
    def awaitEmission(want: (String, Long)): Set[(String, Long)] = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var got = Set.empty[(String, Long)]
      while (!got.contains(want) && System.nanoTime() < deadline) {
        got = spark.table("cap_evict").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        if (!got.contains(want)) Thread.sleep(20)
      }
      assert(got.contains(want), s"no emission $want within deadline: $got")
      got
    }
    try {
      input.addData(aIds.map((_, "a")): _*)
      kept2.foreach(id => awaitEmission(("a", id)))
      Thread.sleep(50) // let group a's 1 ms retention lapse; the engine's
      // continuous timeout batches sweep its state away
      input.addData((100L, "b"))
      awaitEmission(("b", 100L))
      // group a reappears with an id its PRE-eviction cap had rejected:
      // with retained state it would lose to kept2 again; from a fresh
      // (evicted) state it is the sole member and must be emitted kept
      input.addData((loser, "a"))
      val emissions = awaitEmission(("a", loser))
      assert(kept2.forall(id => emissions.contains(("a", id))))
    } finally q.stop()
  }
}
