package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranking.topKByScore]] — the bounded-heap replacement for the
  * per-key ranking window. The load-bearing property is EXACT equality
  * with the window idiom (rows AND rank values) under ties, nulls, and
  * k larger than the group; the plan test pins that ranking really is
  * an aggregate (no Window, no Sort anywhere) so the scale claim — no
  * task ever sorts an unbounded candidate list, heap inserts only — is
  * structural. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def windowReference(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy(desc("score"), col("id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("key", "id", "score", "rank")
  }

  test("heap ranking == window ranking under ties and large k") {
    // scores rounded to one decimal force ties inside every key, so the
    // id tie-break carries the ordering; key 5 has fewer rows than k
    val rows = (1L to 200L).map { i =>
      (i % 5, i, math.round(math.sin(i.toDouble) * 10) / 10.0)
    } :+ ((5L, 999L, 0.5))
    val df = rows.toDF("key", "id", "score")
    val got = Ranking.topKByScore(df, "key", "id", "score", 7)
      .select("key", "id", "score", "rank")
    val want = windowReference(df, 7)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      got.orderBy("key", "rank").collect().mkString("\n"))
    assert(got.count() === want.count())
  }

  test("null scores trail exactly like the window's desc NULLS LAST") {
    val df = Seq[(Long, Long, java.lang.Double)](
      (1L, 10L, 0.9), (1L, 11L, null), (1L, 12L, 0.3), (1L, 13L, null)
    ).toDF("key", "id", "score")
    val got = Ranking.topKByScore(df, "key", "id", "score", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((10L, 1L), (12L, 2L), (11L, 3L)), got.toSeq)
  }

  test("topKCarrying == window ranking with a string tie-break and carried columns") {
    // duplicate scores inside every key force the term tie-break; carry
    // columns must ride through byte-identical
    val rows = (1L to 120L).map { i =>
      (i % 4, s"t${(i * 37) % 30}", (i % 6).toDouble / 2.0, i, i * 10)
    }
    val df = rows.toDF("key", "term", "score", "ca", "cb")
      .dropDuplicates("key", "term")
    val got = Ranking.topKCarrying(df, "key", "score", "term",
      Seq("ca", "cb"), 5, rankName = "rnk")
      .select("key", "term", "score", "ca", "cb", "rnk")
    val w = Window.partitionBy("key").orderBy(desc("score"), col("term"))
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("key", "term", "score", "ca", "cb", "rnk")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      got.orderBy("key", "rnk").collect().mkString("\n"))
    assert(got.count() === want.count())
  }

  test("keepSmallestK == the window quota, string + numeric order columns") {
    val df = (1L to 90L).map(i => (i % 3, i, s"payload$i"))
      .toDF("grp", "id", "body")
    val ord = md5(concat(lit("cap:"), col("id").cast("string")))
    val got = Ranking.keepSmallestK(df, "grp", Seq(ord, col("id")), 7)
    val w = Window.partitionBy("grp").orderBy(ord, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
    assert(got.columns.toSeq === df.columns.toSeq)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === want.count())
  }

  test("property: heap == window on random frames with heavy ties and nulls") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7042L + i)))
    // few distinct scores + nulls ⇒ ties everywhere; ids unique per key
    val rowGen = for {
      key <- Gen.choose(0L, 3L)
      score <- Gen.frequency(
        6 -> Gen.choose(0, 4).map(s => s / 2.0: java.lang.Double),
        1 -> Gen.const(null: java.lang.Double))
    } yield (key, score)
    val frameGen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, rowGen).map(_.zipWithIndex.map {
        case ((k, s), i) => (k, i.toLong, s)
      }))
    samples(frameGen, 6).foreach { rows =>
      val df = rows.toDF("key", "id", "score")
      val got = Ranking.topKByScore(df, "key", "id", "score", 4)
        .select("key", "id", "score", "rank")
      val want = windowReference(df, 4)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"rows=$rows")
      assert(got.count() === want.count(), s"rows=$rows")
    }
  }

  test("rrfFuse: hand-computed fusion, one-sided docs, rank-space ties") {
    // system A ranks (10,11,12); system B ranks (11,10,13).
    // doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/62 — exact tie with doc 11,
    // broken by neighbor_id (10 first). doc 12: 1/63 (A only);
    // doc 13: 1/63 (B only) — tie broken by id (12 first).
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Ranking.rrfFuse(a, b, k = 4).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    val s2 = 1.0 / 61 + 1.0 / 62
    assert(got.toSeq === Seq((10L, s2, 1L), (11L, s2, 2L),
      (12L, 1.0 / 63, 3L), (13L, 1.0 / 63, 4L)), got.toSeq)
  }

  test("rrfFuse: self-fusion preserves the input order with doubled scores") {
    val a = (1L to 30L).map(i => (i % 3, i, (i % 7) + 1L))
      .toDF("query_id", "neighbor_id", "rank")
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy("rank", "neighbor_id")).cast("long"))
    val fused = Ranking.rrfFuse(a, a, k = 100)
    val back = fused.select(col("query_id"), col("neighbor_id"),
      col("rank"))
    assert(back.except(a.select("query_id", "neighbor_id", "rank")).isEmpty)
    val scoresOk = fused.withColumn("want",
        lit(2.0) / (col("rank") + lit(60L)).cast("double"))
      .filter(col("rrf_score") =!= col("want"))
    assert(scoresOk.isEmpty, scoresOk.collect().mkString("\n"))
  }

  test("keepSmallestKIds == keepSmallestK, payload (incl. a MapType) out of the heap") {
    val base = (1L to 90L).map(i => (i % 3, i, s"payload$i"))
      .toDF("grp", "id", "body")
    val ord = Seq(md5(concat(lit("cap:"), col("id").cast("string"))), col("id"))
    val want = Ranking.keepSmallestK(base, "grp", ord, 7)
    val got = Ranking.keepSmallestKIds(base, "grp", ord, "id", 7)
    assert(got.columns.toSeq === base.columns.toSeq)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === want.count())
    // a MapType payload rides through the thin form untouched — it never
    // enters the heap struct, so no ordering over it is ever constructed
    val withMap = base.withColumn("m", map(col("id"), col("body")))
    val gotMap = Ranking.keepSmallestKIds(withMap, "grp", ord, "id", 7)
    assert(gotMap.columns.toSeq === withMap.columns.toSeq)
    assert(gotMap.select("grp", "id", "body").except(want).isEmpty)
    assert(gotMap.count() === want.count())
  }

  // --- the runtime-level fallback guard (r14): plan pins see the
  // ObjectHashAggregate NODE but not its sort-based fallback, which
  // Spark's default conf fires at 128 keys per partition. These two
  // tests pin the property at the RUNTIME level via the exec's own
  // numTasksFallBacked metric: with the raised threshold Ranking
  // installs, 3×10^4 keys in ONE input partition (200× the Spark
  // default, just under FallbackThreshold — the memory-sized ceiling,
  // see its scaladoc) stay hash-aggregated; and when the fallback IS
  // forced (explicit low threshold), results remain byte-identical to
  // the window twin — slower, never wrong.

  private def fallbackTasks(plan: org.apache.spark.sql.execution.SparkPlan): Long = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val self = plan match {
      case o: ObjectHashAggregateExec =>
        val m = o.metrics.get("numTasksFallBacked")
        assert(m.isDefined,
          s"ObjectHashAggregateExec no longer exposes numTasksFallBacked; " +
            s"known metrics: ${o.metrics.keys.mkString(",")}")
        m.get.value
      case _ => 0L
    }
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case p => p.children
    }
    self + kids.map(fallbackTasks).sum
  }

  private def thirtyKKeys = spark.range(60000L).coalesce(1)
    .select((col("id") % 30000L).as("key"), col("id").as("id"),
      (col("id") % 7L).cast("double").as("score"))

  test("guard: 3e4 keys in one partition hash-aggregate with zero sort fallbacks") {
    val ranked = Ranking.topKByScore(thirtyKKeys, "key", "id", "score", 2)
    // collect() runs THIS Dataset's queryExecution (count()/noop-write
    // would execute a different plan tree, leaving these metrics empty)
    assert(ranked.collect().length === 60000) // 2 rows per key, k = 2
    assert(fallbackTasks(ranked.queryExecution.executedPlan) === 0L,
      "the raised fallback threshold did not take effect — the heap " +
        "aggregation sort-fell-back at high key cardinality")
    assert(spark.conf.get(Ranking.FallbackThresholdKey) ===
      Ranking.FallbackThreshold.toString)
  }

  test("guard: a FORCED sort fallback still equals the window ranking exactly") {
    spark.conf.set(Ranking.FallbackThresholdKey, "64")
    try {
      val df = thirtyKKeys.filter(col("key") < 5000L)
      val ranked = Ranking.topKByScore(df, "key", "id", "score", 2)
        .select("key", "id", "score", "rank")
      assert(ranked.collect().length === 10000) // populate ranked's metrics
      assert(fallbackTasks(ranked.queryExecution.executedPlan) > 0L,
        "expected the forced 64-key threshold to fire the sort fallback")
      val want = windowReference(df, 2)
      assert(ranked.except(want).isEmpty && want.except(ranked).isEmpty)
      assert(ranked.count() === want.count())
    } finally spark.conf.unset(Ranking.FallbackThresholdKey)
  }

  test("plan: ranking is a partial-merge aggregate — no Window, no per-key sort") {
    val df = (1L to 50L).map(i => (i % 3, i, i * 0.1)).toDF("key", "id", "score")
    val p = df.sparkSession.sessionState.executePlan(
      Ranking.topKByScore(df, "key", "id", "score", 5).queryExecution.logical)
      .executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort ["), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_collect_top_k") || p.contains("partial collect_top_k")
      || "ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("autoHeapRoom=false leaves the session threshold untouched (r15 ADVICE)") {
    val df = (1L to 50L).map(i => (i % 3, i, i * 0.1)).toDF("key", "id", "score")
    spark.conf.unset(Ranking.FallbackThresholdKey)
    spark.conf.set(Ranking.AutoHeapRoomKey, "false")
    try {
      val ranked = Ranking.topKByScore(df, "key", "id", "score", 5)
      assert(ranked.count() === 15L) // 3 groups × k=5 — works, just un-raised
      assert(spark.conf.get(Ranking.FallbackThresholdKey, "128") === "128",
        "opt-out was ignored — the construction-time raise still fired")
      // an explicit NON-default user setting also wins over the raise
      spark.conf.set(Ranking.AutoHeapRoomKey, "true")
      spark.conf.set(Ranking.FallbackThresholdKey, "4096")
      Ranking.topKByScore(df, "key", "id", "score", 5).count()
      assert(spark.conf.get(Ranking.FallbackThresholdKey) === "4096",
        "an explicit user threshold was clobbered by the auto-raise")
    } finally {
      spark.conf.unset(Ranking.AutoHeapRoomKey)
      spark.conf.unset(Ranking.FallbackThresholdKey)
    }
  }

  test("keepSmallestKIds: a duplicated id that ranks into the kept set fails by name") {
    // two rows share id 42 inside one group at k = 3 — both rank in, so
    // the in-plan distinctness guard must raise instead of letting the
    // semi-join return 4 rows for a 3-quota group
    val df = ((1L to 10L).map(i => (1L, i, s"p$i")) :+ ((1L, 2L, "dup")))
      .toDF("grp", "id", "body")
    val ex = intercept[Exception] {
      Ranking.keepSmallestKIds(df, "grp", Seq(col("id")), "id", 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("not unique")),
      s"expected the named uniqueness guard, got: ${msgs(ex).mkString(" | ")}")
    // and a unique-id frame passes through the guard unchanged
    val clean = (1L to 10L).map(i => (i % 2, i, s"p$i")).toDF("grp", "id", "body")
    assert(Ranking.keepSmallestKIds(clean, "grp", Seq(col("id")), "id", 3)
      .count() === 6L)
  }
}
