package graft

import graft.operators.{Contamination, QualityFilter, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the corpus operators: the properties that
  * make them scale (map-only passes stay map-only; small sides broadcast;
  * nothing degenerates to a cartesian product). Plan text is checked
  * after AQE-independent planning via `explain` capture. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val docs = (1 to 50).map(i =>
    (i.toLong, s"some text body number $i with several words", "en"))
    .toDF("doc_id", "text", "lang")

  test("quality gate is map-only: no exchange in the plan") {
    val p = plan(QualityFilter(docs, "doc_id", "text", "lang"))
    assert(!p.contains("Exchange"), p)
  }

  test("vector normalize is map-only: no exchange in the plan") {
    val emb = (1 to 20).map(i => (i.toLong, Seq(1.0f * i, 2.0f))).toDF("vec_id", "embedding")
    val p = plan(Vectors.normalize(emb, "vec_id", "embedding"))
    assert(!p.contains("Exchange"), p)
  }

  test("contamination joins the benchmark side as a broadcast, never a loop join") {
    val bench = docs.filter(col("doc_id") <= 3)
    val p = plan(Contamination.overlap(docs, bench, "doc_id", "text", n = 3))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the corpus is never shuffled by shingle: per-doc dedup is in-row
    // (array_distinct), so every hash exchange sits ABOVE the broadcast
    // join (the multi-count_distinct Expand dedup + the per-doc agg, both
    // over matched rows only) and none below it — a .distinct() below
    // once cost 199 MB of n-gram strings at the x10 scale point
    val belowJoin = p.substring(p.indexOf("BroadcastHashJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning"), p)
  }

  test("script mix is map-only: no data exchange in the plan") {
    // the only exchange allowed is Tables.spread's round-robin fixture
    // workaround (single-row-group parquet; no-op on real inputs)
    val p = plan(SparkEntry.queries("q_script_mix")(spark, "/root/testdata/sf0.001"))
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"), p)
  }

  test("repetition metrics are map-only: no exchange in the plan") {
    val p = plan(graft.operators.Repetition.ngramRepetition(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), p)
  }

  test("minhash signature build is map-only: no exchange in the plan") {
    val p = plan(graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), p)
  }

  test("SRP-LSH near-dup plan has no corpus broadcast and no product join") {
    val emb = (1 to 40).map(i =>
      (i.toLong, Seq.fill(8)((i % 5).toFloat + 1f))).toDF("vec_id", "embedding")
    val p = plan(graft.operators.Dedup.embeddingNearDupsLsh(
      emb, "vec_id", "embedding", threshold = 0.9))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("feature-hashed BoW is map-only: no exchange in the plan") {
    val p = plan(Vectors.hashedBow(docs, "doc_id", "text", dim = 8))
    assert(!p.contains("Exchange"), p)
  }

  test("tfidf joins the vocabulary df side as a broadcast") {
    val p = plan(graft.operators.Tfidf.topTerms(docs, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("tpch q18/q21: top-k plans, broadcast dims, non-equi self-joins stay hash joins") {
    val dir = "/root/testdata/sf0.001"
    // audit the FINAL adaptive plan (post-execution): broadcast decisions
    // for the grouped-subquery sides are runtime-size calls AQE makes, not
    // static estimates
    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val p18 = finalPlan("q_tpch_q18")
    // top-k never globally sorts, the tiny large-order key set and the
    // customer dim broadcast, and nothing degenerates to a product
    assert(p18.contains("TakeOrderedAndProject"), p18)
    assert(p18.contains("BroadcastHashJoin"), p18)
    assert(!p18.contains("CartesianProduct") &&
      !p18.contains("BroadcastNestedLoopJoin"), p18)
    // partial aggregation on the lineitem group-by (map-side combine)
    assert(p18.contains("partial_sum"), p18)
    val p21 = finalPlan("q_tpch_q21")
    // the exists/not-exists branches keep their equi-key (l_orderkey) as
    // the join key with the <> supplier condition riding along — semi and
    // anti HASH joins, never a loop join over the fact table
    assert(p21.contains("LeftSemi"), p21)
    assert(p21.contains("LeftAnti"), p21)
    assert(p21.contains("TakeOrderedAndProject"), p21)
    assert(p21.contains("BroadcastHashJoin"), p21)
    assert(!p21.contains("CartesianProduct") &&
      !p21.contains("BroadcastNestedLoopJoin"), p21)
  }

  test("tpch q17: correlated scalar subquery decorrelates to one aggregate joined back") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_tpch_q17")(spark, dir)
    df.collect()
    // AdaptiveSparkPlan's rendering carries BOTH the final and the
    // initial plan — count operators in the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the correlated avg-per-part must decorrelate to ONE grouped
    // aggregate (partial+final on l_partkey) LEFT-joined back on the
    // correlation key — never a nested-loop re-execution per probe row
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_avg"), p)
    // exactly two equi-joins: the part dim join and the aggregate
    // join-back; a per-row subplan would surface as extra join/scan pairs
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).length
    assert(joins == 2, s"expected 2 joins, got $joins\n$p")
    // the per-part aggregate appears once (one partial), not per-row
    assert("partial_avg".r.findAllIn(p).length == 1, p)
  }

  test("tpch q20: correlated HAVING aggregate decorrelates inside the semi-join branch") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_tpch_q20")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the correlated 0.1*sum-per-part must decorrelate to ONE per-part
    // aggregate joined back on l_partkey; both INs plan as semi joins;
    // nothing re-executes per group and nothing is a loop join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p)
    // two partial_sum aggregates total: the grouped HAVING body's sum and
    // the decorrelated per-part sum — a per-group subplan would multiply
    // the latter
    assert("partial_sum".r.findAllIn(p).length == 2, p)
    // joins: supplier semi-join, the HAVING-comparison join-back on
    // l_partkey, and TWO part semi-joins — Catalyst pushes the part
    // filter into the decorrelated per-part aggregate branch as well
    // (constraint propagation), so the correlated sum only aggregates
    // parts that can survive; the pushed copy must REUSE the part
    // broadcast, not rebuild it
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).length
    assert(joins == 4, s"expected 4 joins, got $joins\n$p")
    assert(p.contains("ReusedExchange"), p)
  }

  test("tpch q22: global scalar avg runs once and NOT EXISTS plans as one anti join") {
    // sf0.01, not sf0.001: the quartet's other audits run at sf0.001,
    // but Q22's filters leave zero rows there and AQE collapses the
    // whole tree to EmptyRelation — no joins left to pin
    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q_tpch_q22")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the uncorrelated positive-balance average must stay ONE scalar
    // subquery evaluated once and broadcast into the customer filter as
    // a literal comparison — the filter references it, it never becomes
    // a per-row join or re-executed subplan
    assert(p.contains("scalar-subquery") || p.contains("Subquery"), p)
    // NOT EXISTS decorrelates to exactly one LEFT ANTI hash join on
    // o_custkey; never a loop join
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).length
    assert(joins == 1, s"expected 1 join, got $joins\n$p")
  }

  test("tpch q2: correlated scalar MIN over a joined subplan decorrelates to one per-part aggregate") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_tpch_q2")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the correlated min's four-relation body must never re-execute per
    // outer row: no loop join anywhere
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // 8 equi-joins exactly: the outer five-relation chain (4) + the
    // decorrelated subquery's three dim joins + ONE join-back of the
    // per-part min on (partkey, cost) — a per-row subplan would multiply
    // the subquery side
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).length
    assert(joins == 8, s"expected 8 joins, got $joins\n$p")
    // two partial_min aggregates: the inlined supply CTE's per-(part,
    // supplier) min on each branch; the decorrelated per-part min rides
    // the existing partitioning without a second partial pass
    assert("partial_min".r.findAllIn(p).length == 2, p)
    // the dim broadcasts are shared between the outer and subquery
    // branches, not rebuilt
    assert(p.contains("ReusedExchange"), p)
    // global top-100 plans as TakeOrdered, not a global sort exchange
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("prebuilt ingestion store seam: the full query plans a bucketed history scan") {
    // the exact configuration Bench's controlled probe sets up: signature
    // + pre-banded tables in the catalog, conf gate on, broadcast off (the
    // sort-merge shape a real large-batch ingest plans) — the bucketed
    // store scan must survive planning (Spark silently disables bucketed
    // scans when join keys mismatch the bucket columns, which would
    // reintroduce the history shuffle the seam exists to avoid)
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val (storeD, _) = SparkEntry.incrMinhashCorpus(spark, dir)
    spark.sql("DROP TABLE IF EXISTS graft_incr_sigs")
    spark.sql("DROP TABLE IF EXISTS graft_incr_banded")
    try {
      Dedup.minhashSignatures(storeD, "doc_id", "text", 32, 5)
        .write.mode("overwrite").format("parquet").saveAsTable("graft_incr_sigs")
      graft.sources.Sinks.bucketedTableOn(
        Dedup.bandedXxhash(spark.table("graft_incr_sigs"), 32, 8),
        "graft_incr_banded", Seq("band", "bh"), 4)
      spark.conf.set("graft.bench.incrStore", "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(SparkEntry.queries("q_dedup_minhash_incr_fast")(spark, dir))
      assert(p.contains("SelectedBucketsCount"), p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("graft.bench.incrStore")
      spark.sql("DROP TABLE IF EXISTS graft_incr_sigs")
      spark.sql("DROP TABLE IF EXISTS graft_incr_banded")
      graft.operators.Caches.unpersistAll()
    }
  }

  test("bucketed pattern enrich: history side joins with no Exchange, merge-equal results") {
    import java.sql.Timestamp
    def pats(ids: Seq[String], freq: Long) = ids.map(id =>
      (id, s"SELECT $id", freq, 100.0 * freq, Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-06-01 00:00:00"), Seq("u1", s"u_$id"), 10L * freq,
        20L * freq, 30L * freq))
      .toDF("pattern_id", "sql_pattern", "frequency", "total_duration_ms",
        "first_seen", "last_seen", "users", "memory_usage",
        "total_read_rows", "total_read_bytes")
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
    val t = "pat_hist_audit"
    spark.sql(s"DROP TABLE IF EXISTS $t"); spark.sql(s"DROP TABLE IF EXISTS ${t}_staging")
    val first = pats(Seq("a", "b", "c"), 2L)
    val second = pats(Seq("b", "c", "d"), 5L) // overlap + new id both ways
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      graft.operators.PatternStore.enrichBucketed(spark, first, t, numBuckets = 4)
      // the scale claim: history scans bucket-partitioned AND bucket-sorted,
      // so the full-outer sort-merge join plans exactly ONE Exchange and
      // ONE Sort — the fresh delta's — and none above the history scan
      val merged = graft.operators.Patterns.mergeJoin(second, spark.table(t))
      val p = plan(merged)
      assert(p.contains("SortMergeJoin"), p)
      assert("Exchange".r.findAllIn(p).length == 1, p)
      assert("(?m)^(?!.*SortMergeJoin).*\\bSort\\b".r.findAllIn(p).length == 1, p)
      assert(p.contains("SelectedBucketsCount"), p)
      // semantics: join-merge == union+re-agg merge, row for row
      val viaJoin = graft.operators.PatternStore
        .enrichBucketed(spark, second, t, numBuckets = 4)
        .orderBy("pattern_id").collect().toSeq
      val viaUnion = graft.operators.Patterns.merge(second, first)
        .select(viaJoin.head.schema.fieldNames.map(col): _*)
        .orderBy("pattern_id").collect().toSeq
      assert(viaJoin == viaUnion)
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_staging")
    }
  }

  test("pre-banded signature store: candidate join plans with no Exchange above the history scan") {
    import graft.operators.Dedup
    val t = "sig_store_banded_audit"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      val store = (1 to 30).map(i =>
        (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = Dedup.minhashSignaturesPortable(store, "doc_id", "text")
      graft.sources.Sinks.bucketedTableOn(
        Dedup.bandedPortable(sigs, 16, 8), t, Seq("band", "bh"), 4)
      val batch = Seq((100L, (1 to 20).map(j => s"w5_$j").mkString(" ")))
        .toDF("doc_id", "text")
      val bBatch = Dedup.bandedPortable(
        Dedup.minhashSignaturesPortable(batch, "doc_id", "text"), 16, 8)
      // force the sort-merge shape a real (large-batch) ingest would plan
      // — a broadcast of the tiny test batch would bypass distribution
      // requirements entirely and prove nothing about the store side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cand = bBatch.join(spark.table(t), Seq("band", "bh"))
      val p = plan(cand)
      // bucketed history scan: bucket metadata present, and EVERY
      // Exchange lives in the batch branch (the join's FIRST child, whose
      // subtree lines carry the ':' tree prefix) — the store branch plans
      // none above its scan
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"), p)
      val exchangeLines = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
      assert(exchangeLines.nonEmpty && exchangeLines.forall(_.contains(":")), p)
      // and the candidate semantics survive the bucketed layout
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("bucket-pruned enrich: untouched bucket files byte-identical, touched bucket pure, merge-equal") {
    import java.sql.Timestamp
    def pats(ids: Seq[String], freq: Long) = ids.map(id =>
      (id, s"SELECT $id", freq, 100.0 * freq, Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-06-01 00:00:00"), Seq("u1", s"u_$id"), 10L * freq,
        20L * freq, 30L * freq))
      .toDF("pattern_id", "sql_pattern", "frequency", "total_duration_ms",
        "first_seen", "last_seen", "users", "memory_usage",
        "total_read_rows", "total_read_bytes")
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
    val t = "pat_hist_pruned"
    val n = 4
    Seq(t, s"${t}_staging", s"${t}_backup").foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS $x"))
    try {
      // history spread over several buckets; the delta enriches ONE pattern
      val hist = pats(Seq("a", "b", "c", "d", "e", "f", "g", "h"), 2L)
      graft.operators.PatternStore.enrichBucketed(spark, hist, t, numBuckets = n)
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString))
      def snapshot(): Map[String, Seq[Byte]] = {
        val s = java.nio.file.Files.list(loc)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
            .map(p => p.getFileName.toString ->
              java.nio.file.Files.readAllBytes(p).toSeq).toMap
        } finally s.close()
      }
      val before = snapshot()
      val delta = pats(Seq("a"), 5L) // touches exactly bucket(pmod(hash('a'), n))
      val touchedBucket = delta
        .select(pmod(hash(col("pattern_id")), lit(n))).head().getInt(0)
      def bucketOf(name: String): Int =
        "_(\\d+)\\.".r.findFirstMatchIn(name).get.group(1).toInt
      graft.operators.PatternStore.enrichBucketed(spark, delta, t, numBuckets = n)
      val after = snapshot()
      // untouched buckets: the very same files, byte for byte
      val beforeUntouched = before.filter { case (f, _) => bucketOf(f) != touchedBucket }
      val afterUntouched = after.filter { case (f, _) => bucketOf(f) != touchedBucket }
      assert(beforeUntouched == afterUntouched)
      // the touched bucket was rewritten (different file name)
      assert(before.keys.filter(bucketOf(_) == touchedBucket).toSet !=
        after.keys.filter(bucketOf(_) == touchedBucket).toSet)
      // bucket purity: every row of every file hashes to its file's bucket —
      // the invariant that keeps later bucketed (exchange-free) joins correct
      after.keys.foreach { f =>
        val bad = spark.read.parquet(loc.resolve(f).toString)
          .filter(pmod(hash(col("pattern_id")), lit(n)) =!= bucketOf(f)).count()
        assert(bad == 0L, s"file $f holds rows outside its bucket")
      }
      // no journal left behind; staging table dropped
      assert(!java.nio.file.Files.exists(loc.resolve("_swap_journal")))
      assert(!spark.catalog.tableExists(s"${t}_staging"))
      // semantics: pruned enrich == union+re-agg merge, row for row
      val viaPruned = spark.table(t).orderBy("pattern_id").collect().toSeq
      val viaUnion = graft.operators.Patterns.merge(delta, hist)
        .select(viaPruned.head.schema.fieldNames.map(col): _*)
        .orderBy("pattern_id").collect().toSeq
      assert(viaPruned == viaUnion)
    } finally Seq(t, s"${t}_staging", s"${t}_backup").foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("fast-family BIGINT store: cap + candidate join plan no Exchange above the history scan") {
    import graft.operators.Dedup
    val t = "sig_store_banded_fast_audit"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      val store = (1 to 30).map(i =>
        (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(store, "doc_id", "text", 32, 5)
      graft.sources.Sinks.bucketedTableOn(
        Dedup.bandedXxhash(sigs, 32, 8), t, Seq("band", "bh"), 4)
      val batch = Seq((100L, (1 to 20).map(j => s"w5_$j").mkString(" ")))
        .toDF("doc_id", "text")
      val bBatch = Dedup.bandedXxhash(
        Dedup.minhashSignatures(batch, "doc_id", "text", 32, 5), 32, 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the INGESTION shape: overflow-cap the bucketed history, then the
      // cross candidate join — the cap's aggregate and anti-join must ride
      // the bucket layout, so the history branch plans no Exchange at all
      val capped = Dedup.capBuckets(spark.table(t), Seq("band", "bh"),
        Dedup.LshMaxBucket)
      val cand = bBatch.join(capped, Seq("band", "bh"))
      val p = plan(cand)
      assert(p.contains("SelectedBucketsCount"), p)
      val exchangeLines = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
      assert(exchangeLines.nonEmpty && exchangeLines.forall(_.contains(":")), p)
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("corrupt swap journal rolls back instead of bricking the store") {
    import java.sql.Timestamp
    def pats(ids: Seq[String], freq: Long) = ids.map(id =>
      (id, s"SELECT $id", freq, 100.0 * freq, Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-06-01 00:00:00"), Seq("u1", s"u_$id"), 10L * freq,
        20L * freq, 30L * freq))
      .toDF("pattern_id", "sql_pattern", "frequency", "total_duration_ms",
        "first_seen", "last_seen", "users", "memory_usage",
        "total_read_rows", "total_read_bytes")
      .withColumn("avg_duration_ms", col("total_duration_ms") / col("frequency"))
    val t = "pat_hist_corrupt_journal"
    Seq(t, s"${t}_staging", s"${t}_backup").foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS $x"))
    try {
      val hist = pats(Seq("a", "b", "c", "d"), 2L)
      graft.operators.PatternStore.enrichBucketed(spark, hist, t, numBuckets = 4)
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString))
      val expected = spark.table(t).orderBy("pattern_id").collect().toSeq
      // Simulate a torn journal write on a filesystem without atomic
      // rename: one valid ADD line for a file that never landed, then a
      // byte-truncated line. Before the fix this MatchError'd every later
      // enrich; now it must roll back (drop the phantom ADD, keep live
      // files) and the next enrich must succeed.
      java.nio.file.Files.writeString(loc.resolve("_swap_journal"),
        "ADD part-99999-deadbeef_0.c000.snappy.parquet\nDEL")
      val delta = pats(Seq("a"), 3L)
      graft.operators.PatternStore.enrichBucketed(spark, delta, t, numBuckets = 4)
      assert(!java.nio.file.Files.exists(loc.resolve("_swap_journal")))
      val got = spark.table(t).filter(col("pattern_id") === "a")
        .select("frequency").head().getLong(0)
      assert(got == 5L, s"merged frequency after recovery: $got")
      // untouched patterns still intact
      assert(spark.table(t).count() == expected.size.toLong)
    } finally Seq(t, s"${t}_staging", s"${t}_backup").foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("BPE token count and tokenizer surface are map-only: no exchange") {
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the
    // projection — the assertion must see the real scan pipeline
    val dir = java.nio.file.Files.createTempDirectory("bpe_plan").toString + "/docs"
    docs.write.mode("overwrite").parquet(dir)
    val pdocs = spark.read.parquet(dir)
    val merges = graft.functions.Bpe.loadMerges()
    val p1 = plan(pdocs.select(graft.functions.Bpe.mergedTokenCount(col("text"), merges)))
    assert(!p1.contains("Exchange"), p1)
    val p2 = plan(pdocs.select(posexplode(graft.functions.Bpe.tokens(col("text"), merges))))
    assert(!p2.contains("Exchange"), p2)
    // native expressions stay inside whole-stage codegen ("*(n)" is the
    // codegen-stage marker in the executed-plan rendering)
    assert(p1.contains("*(1) Project"), p1)
  }

  test("length band: one tiny percentile aggregate broadcast back, corpus never shuffles") {
    val p = plan(QualityFilter.lengthBand(docs, "doc_id", "text"))
    // the only exchanges feed the 1-row bounds aggregate (partial/final +
    // its broadcast); the corpus side joins via BroadcastNestedLoop on a
    // single-row build — no corpus repartition
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("hashpartitioning(doc_id"), p)
    // the fixed-memory approx twin keeps the same plan shape AND — at a
    // fixture whose distinct token counts sit far under the sketch's
    // compression threshold, where GK summaries are exact — the same rows
    val pa = plan(QualityFilter.lengthBand(docs, "doc_id", "text",
      approx = true))
    assert(pa.contains("BroadcastNestedLoopJoin"), pa)
    assert(!pa.contains("hashpartitioning(doc_id"), pa)
    // keep-decisions compare, not bound values: exact interpolates
    // between elements where the sketch returns an element, so the
    // bounds themselves legitimately differ in the last fraction
    def keeps(approx: Boolean) = QualityFilter.lengthBand(docs, "doc_id",
        "text", approx = approx)
      .select(col("doc_id"), col("keep"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(keeps(approx = true) == keeps(approx = false))
  }

  test("funnel pre-flight's shingle table is cache-substituted into the pair operator's plan") {
    // funnelWithNearDup runs the candidate-volume estimator (which
    // persists the shingle table, scope "dedup") BEFORE building the pair
    // operator over the SAME survivors frame. The claim that the pair
    // operator reuses that materialization — instead of silently
    // re-tokenizing the corpus via an analyzed-plan mismatch — must be a
    // plan fact, not an assumption: capture the pair operator's executed
    // plan at build time and require the in-memory scan.
    import graft.operators.{Caches, CorpusReport, Dedup}
    var pairPlan: String = null
    try {
      val report = CorpusReport.funnelWithNearDup(docs, "doc_id", "text",
        "lang",
        pairsOf = uniq => {
          val pairs = Dedup.jaccardNearDups(uniq, "doc_id", "text",
            shingleN = 5, dfMax = 20, minJaccard = 0.5)
            .select("doc_a", "doc_b")
          pairPlan = pairs.queryExecution.executedPlan.toString
          pairs
        },
        maxCandidatePairs = Some(1000000L),
        candidateVolume = Some(uniq => Dedup.candidateVolumeEstimate(
          uniq, "doc_id", "text", shingleN = 5, dfMax = 20)))
      assert(report.count() == 4L) // all four stages reported
      assert(pairPlan != null && pairPlan.contains("InMemoryTableScan"),
        pairPlan)
    } finally {
      Caches.unpersistScope("corpus")
      Dedup.unpersistIntermediates()
    }
  }

  test("jaccard candidate self-join reads the annotated index from cache on both sides") {
    // both sides of the candidate self-join alias the same df-banded
    // size-annotated index, and the aliasing defeats ReuseExchange — the
    // persist is what keeps the annotation from computing twice. Pin it:
    // the plan must read InMemoryTableScan on both join sides.
    val p = plan(graft.operators.Dedup.jaccardNearDups(docs, "doc_id", "text"))
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2, p)
    graft.operators.Caches.unpersistAll()
  }

  test("bm25 reads the tf frame from cache on all three consumers, avgdl broadcasts") {
    // df aggregate, dl aggregate and the score join all derive from the
    // ONE persisted tf frame; avgdl is a 1-row broadcast, and with no
    // trailing sort the plan has no global range exchange
    val p = plan(graft.operators.Tfidf.topTermsBm25(docs, "doc_id", "text"))
    assert("InMemoryTableScan".r.findAllIn(p).length >= 3, p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    graft.operators.Caches.unpersistAll()
  }

  test("tfidf reads its (doc,term,tf) frame from cache on both branches") {
    // tf feeds the df aggregation AND the join side; self-references get
    // re-aliased attribute ids at analysis, which defeats exchange reuse
    // (the tokenize+explode+partial agg ran twice before the persist).
    // Pin the fix: both consumers must read the in-memory scan.
    val p = plan(graft.operators.Tfidf.topTerms(docs, "doc_id", "text"))
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2, p)
    graft.operators.Caches.unpersistAll()
  }

  test("boilerplate line removal: census and reassembly join via broadcast, no merge join") {
    // the df census aggregates 32-hex fp keys; the boilerplate set and
    // the per-doc removal positions are both small relative to the
    // corpus, so their joins back must be broadcasts — the full-text
    // base side never pays a sort-merge shuffle or a range exchange
    val d = (1 to 40).map(i =>
      (i.toLong, s"shared header line\nunique body $i\nshared footer"))
      .toDF("doc_id", "text")
    val p = plan(graft.operators.Dedup.removeBoilerplateLines(
      d, "doc_id", "text", maxDf = 5))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("batch ingestion and group quota keep their min-per-key WITHOUT a window") {
    // the r13 family closure of the paragraph-dedup de-skew: every
    // remaining first-occurrence/quota selection is a map-combinable
    // aggregate (min_by / CollectTopK heap), so no per-key sort task can
    // serialize a viral fingerprint or a mega-domain
    val batch = (1 to 30).map(i => (i.toLong, s"body ${i % 7}"))
      .toDF("doc_id", "text")
    val store = Seq.empty[String].toDF("fingerprint")
    val pIngest = plan(graft.operators.Dedup.newAgainstStore(
      batch, "doc_id", "text", store))
    assert(!pIngest.contains("Window"), pIngest)
    assert(!pIngest.contains("Sort ["), pIngest)
    val pCap = plan(graft.operators.Sampling.groupCap(
      batch.withColumn("grp", col("doc_id") % 3), "doc_id", "grp", 5))
    assert(!pCap.contains("Window"), pCap)
    assert(!pCap.contains("Sort ["), pCap)
    assert(pCap.contains("ObjectHashAggregate"), pCap)
    // r14 thin-heap pin (VERDICT #6 done-criterion): the payload must
    // NOT ride inside the aggregation buffer — no collect_top_k line may
    // mention the text column; it rejoins via the id semi-join instead
    val heapLines = pCap.linesIterator.filter(_.contains("collect_top_k"))
    assert(heapLines.forall(!_.contains("text")),
      "full text entered the groupCap heap buffer:\n" + pCap)
    val pUniq = plan(graft.operators.CorpusReport.exactUnique(
      batch.withColumn("lang", lit("en")), "doc_id", "text", "lang"))
    assert(!pUniq.contains("Window"), pUniq)
    assert(!pUniq.contains("Sort ["), pUniq)
  }

  test("paragraph dedup: min-agg canonical, NO per-fp sort, removal join via broadcast") {
    // r13 de-skew (VERDICT r12 #5): the first-occurrence canonical is a
    // map-combinable min(struct(doc,pos)) aggregate — a viral paragraph's
    // occurrence set collapses in partial aggs instead of serializing one
    // window task. Pin it: no Window, no sort anywhere (the old form's
    // per-fp row_number planned a per-key Sort under the window), and the
    // reassembly join back onto the full-text base still broadcasts.
    val d = (1 to 40).map(i =>
      (i.toLong, s"shared para\nunique body $i\nshared para"))
      .toDF("doc_id", "text")
    // (the min(struct) buffer keeps the agg out of HashAggregate — a
    // SortAggregate's per-partition sorts are fine: partial mins are
    // computed per input split, so no task ever holds one fp's whole
    // occurrence set the way the Window evaluator did)
    val p = plan(graft.operators.Dedup.dedupParagraphs(d, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("pq ADC: codebook and table joins broadcast; no merge join, no range exchange") {
    // build/encode join the broadcast codebook; scoring joins codes
    // against the broadcast per-query table set (non-equi vid!=query_id
    // ⇒ a BroadcastNestedLoop over the TINY broadcast side — the flat-PQ
    // scan shape); ranking is Ranking.topKByScore's bounded-heap
    // aggregate (r13), so NO Window and no per-key candidate sort
    // survive — the only wide exchanges are hash aggregates
    val emb = (1 to 40).map(i =>
      (i.toLong, Seq.tabulate(64)(d => ((i * 7 + d) % 5).toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val p = plan(graft.operators.Pq.topK(emb, "vec_id", "embedding",
      col("query_id") % 5 === 0, k = 3, m = 8, numCentroids = 4, dim = 64))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    graft.operators.Caches.unpersistScope("pq")
    graft.operators.Caches.unpersistScope("ivf")
  }

  test("ivf-pq: cell-pruned scoring joins on the cell id via broadcast — no product join") {
    // the composed serving shape: candidates come from an EQUI-join of
    // codes against the broadcast (query × probed-cell) table on
    // centroid_id — the flat scan's nested loop is gone; nothing plans a
    // cartesian or merge join
    val emb = (1 to 40).map(i =>
      (i.toLong, Seq.tabulate(64)(d => ((i * 7 + d) % 5).toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val p = plan(graft.operators.Pq.ivfPqTopK(emb, "vec_id", "embedding",
      col("query_id") % 5 === 0, k = 3, m = 8, numCentroids = 4, dim = 64,
      coarseK = 4, nProbe = 2))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    // candidate ranking is the bounded-heap aggregate; the one Window
    // exec left is the probe selection over queries × coarseK rows
    // (bounded by the centroid count, not the corpus — not a scale
    // hazard; WindowGroupLimit nodes are that window's own rank-limit
    // pushdown, not extra windows)
    assert("Window \\[".r.findAllIn(p).length <= 1, p)
    assert(p.contains("ObjectHashAggregate"), p)
    graft.operators.Caches.unpersistScope("pq")
    graft.operators.Caches.unpersistScope("ivf")
  }

  test("corpus diff: both sides reduce to thin (id, fp) pairs before the one join") {
    // the full-outer join cannot broadcast, but what shuffles must be
    // the two map-only (id, 32-hex fp) reductions — never the text: two
    // hash exchanges total, no product join, and no exchange carries
    // the text attribute
    val o = (1 to 40).map(i => (i.toLong, s"old body $i")).toDF("doc_id", "text")
    val n = (3 to 42).map(i => (i.toLong, s"new body $i")).toDF("doc_id", "text")
    val p = plan(graft.operators.Dedup.corpusDiff(o, n, "doc_id", "text"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text"), exchanges)
  }

  test("split leakage: assignment joins never shuffle the pair side wide") {
    // the pair frame is near-dup-output cardinality (small); Spark must
    // broadcast it against the corpus-wide split assignment — the audit
    // overlay adds no product join and no range exchange
    import graft.operators.Sampling
    val ids = (0L until 200L)
    val splits = Sampling.split(ids.toDF("doc_id"), "doc_id")
    val pairs = Seq((1L, 2L, 0.9), (3L, 150L, 0.8), (7L, 9L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
    val p = plan(Sampling.splitLeakage(pairs, splits))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("url canonicalization + domain rollup: map-side until one aggregate exchange") {
    import graft.functions.Urls
    val u = (1 to 30).map(i =>
      (i.toLong, s"HTTPS://Site$i.co.uk:443/p/$i?utm_source=x&id=$i#f"))
      .toDF("doc_id", "url")
    val agg = u.select(Urls.canonicalUrl(col("url")).as("curl"))
      .select(col("curl"), Urls.registrableDomainOf(
        Urls.hostOf(col("curl"))).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("curl")).as("n_canon"))
    val p = plan(agg)
    // canonicalize/host/domain are pure codegen'd projections: the only
    // data exchange is the domain aggregate's (count_distinct plans a
    // two-phase agg over ONE exchange pair on the test corpus)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("containment candidates come from equi-joins, never a product join") {
    val p = plan(graft.operators.Dedup.containmentNearDups(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    graft.operators.Caches.unpersistAll()
  }

  test("rerank refinement: id-grain corpus probe stays broadcast — no sort-merge, no product join") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = plan(graft.operators.Pq.ivfPqTopKRerank(emb, "vec_id",
      "embedding", col("query_id") % 20 === 0, k = 5, m = 8,
      numCentroids = 16, dim = 64, coarseK = 16, nProbe = 4))
    // the exact refinement must read the corpus ONCE via broadcast hash
    // joins against the (queries × 4k)-row shortlist — never shuffle it
    // (the 1-row rr_tab rider's BroadcastNestedLoopJoin is the
    // documented exception; a CartesianProduct or a corpus-side
    // SortMergeJoin is not)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    graft.operators.Caches.unpersistAll()
  }

  test("filtered serving: a carried-metadata predicate reaches the codes scan as a PushedFilter") {
    import graft.operators.{Ivf, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (_, cents) = Ivf.build(emb, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    spark.sql("DROP TABLE IF EXISTS graft_plan_codes")
    try {
      // index persisted WITH the metadata column in its layout — the
      // servingCodes carry seam (one map-only pass, no join)
      Pq.servingCodes(emb, "vec_id", "embedding", cb, cents, m = 8,
          dim = 64, carry = Seq("label"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable("graft_plan_codes")
      val queries = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec")).filter(col("query_id") % 20 === 0)
      val served = Pq.ivfPqServe(spark.table("graft_plan_codes"), cents, cb,
        queries, k = 5, m = 8, numCentroids = 16, dim = 64, nProbe = 4,
        candPred = Some(col("label") === 3))
      val p = plan(served)
      // the equality predicate must land in the parquet scan's
      // PushedFilters — row groups skip before any ADC lookup runs
      // (an id-arithmetic predicate like vid % 3 cannot push; this is
      // exactly why the index carries the metadata column)
      assert(p.contains("PushedFilters") &&
        "PushedFilters: \\[[^\\]]*EqualTo\\(label,3\\)".r
          .findFirstIn(p).isDefined, p)
      // and the served rows are correct: quota filled, only label-3
      // neighbors (checked against the raw table)
      val rows = served.collect()
      assert(rows.nonEmpty)
      val allowed = emb.filter(col("label") === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(rows.forall(r => allowed(r.getAs[Long]("neighbor_id"))))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_plan_codes")
      graft.operators.Caches.unpersistAll()
    }
  }

  test("sparse serving: the query vocabulary prunes the postings scan (pushed In + bucket pruning)") {
    import graft.operators.Tfidf
    val corpus = (1 to 200).map(i =>
      (i.toLong, s"word$i alpha beta shared${i % 7} tail")).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS graft_plan_postings")
    try {
      val idx = Tfidf.buildBm25Index(corpus, "doc_id", "text")
      graft.sources.Sinks.bucketedTableOn(idx.postings,
        "graft_plan_postings", Seq("term"), 8)
      val queries = Seq((1L, "alpha shared3")).toDF("query_id", "qtext")
      val served = Tfidf.searchBm25Served(
        Tfidf.Bm25Index(spark.table("graft_plan_postings"), idx.termStats,
          idx.corpusStats),
        queries, "query_id", "qtext", k = 5)
      val p = plan(served)
      // a broadcast join alone prunes nothing at the scan — the batch's
      // term literals must land in the postings scan as a PushedFilter
      // AND select a bucket subset, so footers skip before any posting
      // is read
      assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(p).isDefined, p)
      val buckets = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(p).map(_.group(1).toInt)
      assert(buckets.exists(_ < 8), s"buckets=$buckets\n$p")
      // the probe itself stays a hash join — no sort-merge, no product
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      // and the filter changed nothing: served == inline on the rows
      val inline = Tfidf.searchBm25(corpus, "doc_id", "text", queries,
        "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
      assert(served.collect().map(_.toSeq).toSet == inline && inline.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_plan_postings")
      graft.operators.Caches.unpersistAll()
    }
  }

  test("phrase search: codegen hash aggregates, no distinct expand, no sort-merge") {
    import graft.operators.Tfidf
    val corpus = (1 to 100).map(i =>
      (i.toLong, s"alpha beta w$i gamma alpha")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha beta")).toDF("query_id", "qtext")
    val p = plan(Tfidf.phraseSearch(
      Tfidf.positionalPostings(corpus, "doc_id", "text"),
      queries, "query_id", "qtext"))
    // the match aggregate is the hot stage at serve scale: it must be
    // the codegen'd primitive HashAggregate — no ObjectHashAggregate
    // buffers, no Expand (the count_distinct the r15 redesign removed
    // would plan one) — and the probe joins hash, never sort-merge
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate") && !p.contains("Expand"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    graft.operators.Caches.unpersistAll()
  }

  test("semantic dedup pairs via equi-join on the cluster id, never a product join") {
    val emb = (1 to 40).map(i =>
      (i.toLong, Seq.fill(8)((i % 5).toFloat + 1f))).toDF("vec_id", "embedding")
    val p = plan(graft.operators.Dedup.semanticDedup(
      emb, "vec_id", "embedding", threshold = 0.9, k = 4, iters = 1))
    // the only broadcast allowed is the k-row centroid table
    assert(!p.contains("CartesianProduct"), p)
    graft.operators.Caches.unpersistAll()
  }
}
