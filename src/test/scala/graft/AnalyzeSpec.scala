package graft

import java.sql.Timestamp
import graft.dbt.DbtLoader
import graft.model.{QueryLog, SamplingConfig}
import graft.operators.PatternStore
import org.apache.spark.sql.functions._

/** End-to-end `analyze` lifecycle (SURVEY.md §3.1 / §5 item 3) over a
  * synthesized query_log fixture + the dbt fixture project. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ts(offsetH: Int) = new Timestamp(t0 + offsetH * 3600000L)

  private val fixture = Seq(
    // frequent fast pattern on a dbt-mapped table (8×)
    (0 until 8).map(i => QueryLog(s"a$i", s"SELECT * FROM acme.stg_orders WHERE o_orderkey = $i",
      "SELECT", "alice", ts(i), 40.0 + i, 10, 100, 1, 10, 1000, "")),
    // slow join pattern touching an unmapped table (4×)
    (0 until 4).map(i => QueryLog(s"b$i",
      s"SELECT * FROM analytics.fct_revenue r JOIN legacy.raw_stuff s ON r.k = s.k WHERE d = $i",
      "SELECT", "bob", ts(i + 2), 2500.0, 10, 100, 1, 10, 2000, "")),
    // system-table-only pattern (3×) — must get no recommendation (F11)
    (0 until 3).map(i => QueryLog(s"c$i", s"SELECT * FROM system.query_log WHERE x = $i",
      "SELECT", "carol", ts(i), 10.0, 1, 1, 1, 1, 10, "")),
    // singleton — dropped by min_frequency=2
    Seq(QueryLog("d0", "SELECT 1 FROM once.only", "SELECT", "dave", ts(0),
      1.0, 0, 0, 0, 0, 0, ""))).flatten

  private def logsDf = fixture.toDF()
  lazy val proj = DbtLoader.load(resource("dbt_project"))

  test("levels 1-4 produce patterns, coverage, recommendations") {
    val res = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)))
    val pats = res.patterns.orderBy(desc("impact")).collect()
    assert(pats.length == 3) // singleton dropped by HAVING
    val top = pats.head
    assert(top.getAs[Long]("frequency") == 4L) // slow join dominates impact
    assert(top.getList[String](top.fieldIndex("dbt_models_used")).toArray.toSeq == Seq("fct_revenue"))
    assert(top.getList[String](top.fieldIndex("unmapped_tables")).toArray.toSeq == Seq("legacy.raw_stuff"))

    val cov = res.coverage.get.head()
    // used: stg_orders, fct_revenue (+1-hop parents stg_customers, stg_orders)
    assert(cov.getAs[Long]("n_used") == 3)
    assert(cov.getAs[String]("unused_models") == "int_secrets,rpt_daily")

    val recs = res.recommendations.get.collect()
    val types = recs.map(_.getAs[String]("rec_type")).toSet
    assert(types.contains("REWRITE_QUERY"))  // slow join
    assert(types.contains("NEW_DBT_MODEL"))  // unmapped table
    // system-only pattern filtered out entirely
    val sysId = pats.map(_.getAs[String]("pattern_id"))
      .find(id => pats.find(_.getAs[String]("pattern_id") == id).get
        .getList[String](pats.head.fieldIndex("tables_accessed")).toArray.toSeq.forall(_.toString.startsWith("system.")))
    sysId.foreach(id => assert(!recs.exists(_.getAs[String]("pattern_id") == id)))
  }

  test("recommender seam: rule engine is the default, LLM backend is drop-in") {
    import graft.operators.{LlmRecommender, RuleRecommender}
    // (a) the default is the rule engine: explicit RuleRecommender produces
    // the identical recommendation set
    val base = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)))
    val explicit = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)),
      recommender = RuleRecommender)
    def rows(r: AnalysisResult) = r.recommendations.get
      .orderBy("pattern_id", "rec_type").collect().map(_.toSeq).toSeq
    assert(rows(base) == rows(explicit))

    // (b) the LLM path: fake transport answering the reference's RESPONSE
    // FORMAT (ai_suggester.py:199-204); prompts must carry the pattern
    // metrics, system-only patterns must never reach the transport, and
    // sections parse into the shared output schema
    val prompts = scala.collection.mutable.ArrayBuffer[String]()
    val llm = new LlmRecommender(p => {
      prompts += p
      """Here you go:
        |**Type:** REWRITE_QUERY
        |Description: Pre-aggregate the revenue side
        |before joining.
        |Impact: high
        |```sql
        |SELECT 1
        |```""".stripMargin
    })
    val viaLlm = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)), recommender = llm)
    val recs = viaLlm.recommendations.get.collect()
    assert(recs.nonEmpty && recs.forall(_.getAs[String]("rec_type") == "REWRITE_QUERY"))
    assert(recs.forall(_.getAs[String]("impact_level") == "HIGH"))
    // multi-line Description accumulates until the next marker
    assert(recs.forall(_.getAs[String]("description") ==
      "Pre-aggregate the revenue side before joining."))
    // system-table-only pattern never produced a prompt
    assert(prompts.nonEmpty && !prompts.exists(_.contains("system.query_log")))
    assert(prompts.exists(p => p.contains("legacy.raw_stuff") && p.contains("Frequency: 4")))

    // (c) a transport failure skips that pattern, not the run
    val flaky = new LlmRecommender(_ => sys.error("boom"))
    val viaFlaky = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)), recommender = flaky)
    assert(viaFlaky.recommendations.get.count() == 0)
  }

  test("sampling config filters apply (F1/F2/F5)") {
    val res = Analyze.run(logsDf,
      SamplingConfig(includeUsers = Seq("ALICE"), slowOnlyThresholdMs = Some(30.0)),
      None, AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)))
    val pats = res.patterns.collect()
    assert(pats.length == 1)
    assert(pats.head.getAs[Long]("frequency") == 8L)
  }

  test("level 1 stops before aggregation") {
    val res = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.DataCollection, asOf = lit(ts(100)))
    assert(res.patterns.isEmpty)
    assert(res.logs.count() == fixture.size)
  }

  test("JSON export is valid and capped (S9)") {
    val res = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)))
    val json = Analyze.exportJson(res, topN = 2)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(json.contains("\"pattern_id\""))
    assert(json.split("\\},\\{").length == 2)
  }

  test("focus arms: slow folds into acquisition, frequent into criteria") {
    // slow: only bob's 2500ms pattern survives (data_acquisition.py:113-114)
    val slow = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)), focus = QueryFocus.Slow)
    assert(slow.patterns.collect().map(_.getAs[Long]("frequency")).toSeq == Seq(4L))
    // frequent: threshold 100 — nothing in this fixture reaches it
    val freq = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)), focus = QueryFocus.Frequent)
    assert(freq.patterns.isEmpty)
    assert(QueryFocus.parse("ALL") == QueryFocus.All)
  }

  test("pattern criteria through run: ids, tables, min-duration, models (F6-F10)") {
    val byTable = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)),
      criteria = graft.operators.Filters.PatternCriteria(selectTables = Seq("acme.stg_orders")))
    assert(byTable.patterns.collect().map(_.getAs[Long]("frequency")).toSeq == Seq(8L))

    val byDuration = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)),
      criteria = graft.operators.Filters.PatternCriteria(minAvgDurationMs = Some(1000.0)))
    assert(byDuration.patterns.collect().map(_.getAs[Long]("frequency")).toSeq == Seq(4L))

    // model selection applies AFTER dbt enrichment (querysight.py:386-397)
    val byModel = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.Optimization, asOf = lit(ts(100)),
      criteria = graft.operators.Filters.PatternCriteria(selectModels = Seq("fct_revenue")))
    val pats = byModel.patterns.collect()
    assert(pats.length == 1)
    assert(pats.head.getList[String](pats.head.fieldIndex("dbt_models_used"))
      .toArray.toSeq == Seq("fct_revenue"))

    val byId = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.PatternAnalysis, asOf = lit(ts(100)),
      criteria = graft.operators.Filters.PatternCriteria(patternIds = Seq("no-such-id")))
    assert(byId.patterns.isEmpty)
  }

  test("--sample-size maps to seeded sampling at acquisition") {
    val res = Analyze.run(logsDf, SamplingConfig(), None,
      AnalysisLevel.DataCollection, asOf = lit(ts(100)), sampleFraction = Some(0.5))
    val n = res.logs.count()
    assert(n > 0 && n < fixture.size) // seed fixed -> deterministic strict subset
  }

  test("schema-aware INDEX recommendation names actual columns (ai_suggester.py:56-63)") {
    val enriched = Seq(
      ("p1", "select * from orders where o_custkey = ? and o_orderdate > ?",
        200L, 1500.0, Seq("orders"), Seq.empty[String], Seq.empty[String]))
      .toDF("pattern_id", "sql_pattern", "frequency", "avg_duration_ms",
        "tables_accessed", "dbt_models_used", "unmapped_tables")
    val schemas = Seq(
      ("orders", "o_custkey", "bigint"), ("orders", "o_orderdate", "date"),
      ("orders", "o_payload", "string"))
      .toDF("table_name", "column_name", "column_type")
    val recs = graft.operators.Recommend.recommend(enriched, Some(schemas)).collect()
    val idx = recs.find(_.getAs[String]("rec_type") == "INDEX").get
    val desc = idx.getAs[String]("description")
    assert(desc.contains("orders.o_custkey") && desc.contains("orders.o_orderdate"))
    assert(!desc.contains("o_payload")) // not referenced by the pattern text
    // without schemas the description stays generic (back-compat)
    val plain = graft.operators.Recommend.recommend(enriched).collect()
      .find(_.getAs[String]("rec_type") == "INDEX").get.getAs[String]("description")
    assert(!plain.contains("o_custkey") && plain.endsWith("filter columns"))
  }

  test("generate-model scaffolds uncovered tables (reference advertises, never ships)") {
    val res = Analyze.run(logsDf, SamplingConfig(), Some(proj),
      AnalysisLevel.DbtIntegration, asOf = lit(ts(100)))
    val schemas = Seq(("legacy.raw_stuff", "k", "bigint"),
      ("legacy.raw_stuff", "d", "bigint"))
      .toDF("table_name", "column_name", "column_type")
    val sc = graft.operators.ModelGen.scaffolds(res.patterns, Some(schemas)).collect()
    assert(sc.length == 1) // only legacy.raw_stuff is uncovered
    val r = sc.head
    assert(r.getAs[String]("model_name") == "stg_raw_stuff")
    val sql = r.getAs[String]("model_sql")
    assert(sql.contains("{{ source('legacy', 'raw_stuff') }}"))
    assert(sql.contains("d,\n    k")) // schema-narrowed select list, sorted
    assert(r.getAs[String]("schema_yml").contains("name: stg_raw_stuff"))
    // without schemas the scaffold falls back to select *
    val star = graft.operators.ModelGen.scaffolds(res.patterns, None).collect().head
    assert(star.getAs[String]("model_sql").contains("select\n    *\n"))
  }

  test("PatternStore enrich keeps additive upsert semantics (A6, documented quirk)") {
    val dir = java.nio.file.Files.createTempDirectory("pstore").toString + "/hist"
    val pats = Analyze.patterns(logsDf, minFrequency = 2)
      .drop("impact", "tables_accessed")
    // collect eagerly: the returned frames read `dir`, which the second
    // enrich overwrites
    val firstFreqs = PatternStore.enrich(spark, pats, dir, nowMs = t0).collect()
      .map(r => r.getAs[String]("pattern_id") -> r.getAs[Long]("frequency")).toMap
    val freqByPattern = PatternStore.enrich(spark, pats, dir, nowMs = t0).collect()
      .map(r => r.getAs[String]("pattern_id") -> r.getAs[Long]("frequency")).toMap
    assert(freqByPattern.values.toSeq.sorted ==
      firstFreqs.values.map(_ * 2).toSeq.sorted) // re-analysis double-counts
    assert(PatternStore.isValid(dir, t0 + 1000))
    assert(!PatternStore.isValid(dir, t0 + 13L * 3600 * 1000))
    // two-phase staging directory is cleaned up after the final write
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "_staging")))
  }
}
