package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.model.QueryLog

/** E2e over the CLI command handlers (`querysight.py analyze|export`
  * surface): every reference flag drives the engine through the same
  * code path `Cli.main` uses, minus the session lifecycle (the suite
  * shares one session). */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ts(offsetH: Int) = new Timestamp(t0 + offsetH * 3600000L)
  private val asOf = "2023-11-19 00:00:00" // > all fixture timestamps

  private lazy val logsPath: String = {
    val logs = (
      (0 until 8).map(i => QueryLog(s"a$i", s"SELECT * FROM acme.stg_orders WHERE o_orderkey = $i",
        "SELECT", "alice", ts(i), 40.0 + i, 10, 100, 1, 10, 1000, "")) ++
      (0 until 4).map(i => QueryLog(s"b$i",
        s"SELECT * FROM analytics.fct_revenue WHERE d = $i",
        "SELECT", "bob", ts(i), 2500.0, 10, 100, 1, 10, 2000, "")) ++
      (0 until 3).map(i => QueryLog(s"c$i",
        s"SELECT * FROM legacy.raw_stuff WHERE k = $i",
        "SELECT", "carol", ts(i), 50.0, 10, 100, 1, 10, 500, ""))).toDF()
    val p = Files.createTempDirectory("cli_logs").toString + "/logs.parquet"
    logs.write.parquet(p)
    p
  }

  private def capture(body: => Unit): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out))(body)
    out.toString("UTF-8")
  }

  test("analyze honors focus/min-duration/select-tables/sample-size/sort-by") {
    val slow = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "focus" -> "slow",
      "format" -> "json")))
    assert(slow.contains("fct_revenue") && !slow.contains("stg_orders"))

    val minDur = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2",
      "min-duration" -> "1000", "format" -> "json")))
    assert(minDur.contains("fct_revenue") && !minDur.contains("stg_orders"))

    val byTable = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2",
      "select-tables" -> "acme.stg_orders", "format" -> "json")))
    assert(byTable.contains("stg_orders") && !byTable.contains("fct_revenue"))

    // sort-by frequency puts the 8x pattern first
    val byFreq = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2",
      "sort-by" -> "frequency", "format" -> "json")))
    assert(byFreq.indexOf("stg_orders") < byFreq.indexOf("fct_revenue"))

    val sampled = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2",
      "sample-size" -> "0.5", "min-frequency" -> "1", "format" -> "json")))
    assert(sampled.nonEmpty) // sampling path executes end to end
  }

  test("analyze --select-patterns selects by pattern id") {
    val all = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "format" -> "json")))
    val firstId = "\"pattern_id\":\"([0-9a-f]+)\"".r
      .findFirstMatchIn(all).get.group(1)
    val one = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2",
      "select-patterns" -> firstId, "format" -> "json")))
    assert(one.contains(firstId))
    assert("\"pattern_id\"".r.findAllIn(one).size == 1)
  }

  test("reference flag aliases: --include-users, --query-kinds, --level by name") {
    val byAlias = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "pattern_analysis",
      "include-users" -> "bob", "format" -> "json")))
    assert(byAlias.contains("fct_revenue") && !byAlias.contains("stg_orders"))
    val byKind = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "pattern_analysis",
      "query-kinds" -> "INSERT", "format" -> "json")))
    assert(!byKind.contains("fct_revenue")) // fixture is all SELECT
  }

  test("rich display: paged tables, summary stats, --page-size (S10)") {
    // level 2: the compact table (querysight.py:686-715)
    val compact = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2")))
    assert(compact.contains("query patterns:"))
    assert(compact.contains("| Pattern ID"))
    assert(compact.contains("Avg Duration (ms)"))

    // full display: pagination at page-size 1 + summary statistics block
    val full = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "4",
      "dbt-project" -> resource("dbt_project"), "page-size" -> "1")))
    assert(full.contains("Query Patterns (Page 1/"))
    assert(full.contains("(Page 2/")) // page-size 1 forces >1 page
    assert(full.contains("Total Patterns:"))
    assert(full.contains("Summary Statistics"))
    assert(full.contains("Query Speed Distribution"))
    assert(full.contains("Slow (>1s):"))
    assert(full.contains("Analysis completed at level: optimization"))
  }

  test("rich display: coverage detail view with J4 parent/child models") {
    val out = capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "4",
      "dbt-project" -> resource("dbt_project"))))
    assert(out.contains("DBT Model Coverage Analysis"))
    assert(out.contains("Patterns Using DBT Models"))
    // fct_revenue pattern: parents = stg_customers/stg_orders, child = rpt_daily
    assert(out.contains("Direct Models: fct_revenue"))
    assert(out.contains("Parent Models: stg_customers, stg_orders"))
    assert(out.contains("Child Models: rpt_daily"))
    // legacy.raw_stuff never maps to a model
    assert(out.contains("Uncovered Tables Summary"))
    assert(out.contains("legacy.raw_stuff"))
    assert(out.contains("Recommendation 1"))
  }

  test("cache flags: --no-cache bypasses the store, --force-reset wipes it") {
    val store = Files.createTempDirectory("cli_cache").toString + "/hist"
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store,
      "no-cache" -> "true", "format" -> "json")))
    assert(!Files.exists(Paths.get(store))) // bypassed: nothing written
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store,
      "format" -> "json")))
    val once = spark.read.parquet(store)
      .select("frequency").as[Long].collect().sum
    // without reset the additive upsert double-counts; --force-reset
    // starts from an empty store, so the totals match a single run
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store,
      "force-reset" -> "true", "format" -> "json")))
    val afterReset = spark.read.parquet(store)
      .select("frequency").as[Long].collect().sum
    assert(afterReset == once)
  }

  test("parseArgs-style bare flags reach handlers as boolean values") {
    // end-to-end through Cli.main-style args is covered above via maps;
    // here: flag-at-end and flag-before-flag both parse as true
    val m = Cli.parseArgsForTest(Seq("--force-reset", "--no-cache", "--level", "2"))
    assert(m("force-reset") == "true" && m("no-cache") == "true" && m("level") == "2")
  }

  test("parseArgs rejects a value-taking option with no value") {
    // `analyze --logs` used to yield logs="true" and die downstream with a
    // confusing parquet-read error; now it is a parse error up front
    val e = intercept[RuntimeException](Cli.parseArgsForTest(Seq("--logs")))
    assert(e.getMessage.contains("missing value for --logs"))
    val e2 = intercept[RuntimeException](
      Cli.parseArgsForTest(Seq("--logs", "--level", "2")))
    assert(e2.getMessage.contains("missing value for --logs"))
  }

  test("parseArgs --key=value escape hatch allows values starting with --") {
    val m = Cli.parseArgsForTest(Seq("--sort-by=--weird--", "--level=2", "--cache"))
    assert(m("sort-by") == "--weird--" && m("level") == "2" && m("cache") == "true")
  }

  test("--force-reset wipes the store even under --no-cache (reference parity)") {
    // initialize_analysis_components resets whenever force_reset is set,
    // regardless of the cache flag (querysight.py:313, cache_manager.py:26)
    val store = Files.createTempDirectory("cli_cache_fr").toString + "/hist"
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store,
      "format" -> "json")))
    assert(Files.exists(Paths.get(store)))
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store,
      "no-cache" -> "true", "force-reset" -> "true", "format" -> "json")))
    // reset ran (store gone) and no-cache kept the enrich path from rewriting
    assert(!Files.exists(Paths.get(store)))
  }

  test("generate-model writes dbt scaffolds for uncovered tables") {
    val outDir = Files.createTempDirectory("cli_models").toString
    capture(Cli.generateModel(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf,
      "dbt-project" -> resource("dbt_project"), "output" -> outDir)))
    val sql = Files.readString(Paths.get(outDir, "stg_raw_stuff.sql"))
    assert(sql.contains("{{ source('legacy', 'raw_stuff') }}"))
    assert(Files.exists(Paths.get(outDir, "stg_raw_stuff.yml")))
    // JSON mode + --table filter
    val json = capture(Cli.generateModel(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf,
      "dbt-project" -> resource("dbt_project"), "table" -> "legacy.raw_stuff")))
    assert(json.contains("\"model_name\":\"stg_raw_stuff\""))
  }

  test("export --output writes the JSON file (querysight.py:816-817)") {
    val store = Files.createTempDirectory("cli_store").toString + "/hist"
    capture(Cli.analyze(spark, Map(
      "logs" -> logsPath, "as-of" -> asOf, "level" -> "2", "store" -> store)))
    val outFile = Files.createTempDirectory("cli_out").toString + "/result.json"
    capture(Cli.exportLatest(spark, Map("store" -> store, "output" -> outFile)))
    val json = Files.readString(Paths.get(outFile))
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(json.contains("\"pattern_id\""))
    // stdout fallback unchanged
    val stdout = capture(Cli.exportLatest(spark, Map("store" -> store)))
    assert(stdout.trim == json)
  }

  test("corpus: gate + dedup writes kept docs and reports stage counts") {
    val docs = Seq(
      (1L, "the quick brown fox and the dog walk to a house in the field today fine", "en"),
      (2L, "the quick  brown fox and the dog walk to a house in the field today fine", "en"), // ws dup of 1
      (3L, "short", "en"),                                                // quality drop
      (4L, "a completely different long document with many plain words that is fine and the end", "en"))
      .toDF("doc_id", "text", "lang")
    val in = Files.createTempDirectory("cli_corpus").toString + "/docs.parquet"
    docs.write.parquet(in)
    val out = Files.createTempDirectory("cli_corpus_out").toString + "/kept"
    val json = capture(Cli.corpus(spark, Map(
      "docs" -> in, "out" -> out, "min-tokens" -> "3", "dedup" -> "normalized"))).trim
    assert(json == """{"n_in":4,"n_quality":3,"n_out":2,"dropped_quality":1,"dropped_dup":1}""")
    val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("corpus: jsonl shard export + funnel report sidecar") {
    val docs = Seq(
      (1L, "the quick brown fox and the dog walk to a house in the field today fine", "en"),
      (2L, "the quick  brown fox and the dog walk to a house in the field today fine", "en"),
      (3L, "short", "en"),
      (4L, "a completely different long document with many plain words that is fine and the end", "en"))
      .toDF("doc_id", "text", "lang")
    val base = Files.createTempDirectory("cli_corpus_jl").toString
    val in = base + "/docs.parquet"
    docs.write.parquet(in)
    val out = base + "/kept"
    val funnel = base + "/funnel"
    capture(Cli.corpus(spark, Map(
      "docs" -> in, "out" -> out, "min-tokens" -> "3",
      "dedup" -> "normalized", "format" -> "jsonl", "funnel" -> funnel)))
    // shards are zstd JSONL by default, readable back with full fidelity
    val files = new java.io.File(out).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".json.zstd")), files.mkString(","))
    // Simulate a FRESH reading session that never wrote a shard: strip
    // the codec registration the write left on the shared Hadoop conf,
    // then register through the public read-path helper. Before the
    // helper existed this read only worked by write-session side effect.
    spark.sparkContext.hadoopConfiguration.unset("io.compression.codecs")
    graft.sources.TextSources.registerZstd(spark)
    val back = spark.read.json(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(back == Seq(1L, 4L))
    // --codec gzip stays accepted for consumers that require it
    val outGz = base + "/kept_gz"
    capture(Cli.corpus(spark, Map(
      "docs" -> in, "out" -> outGz, "min-tokens" -> "3",
      "dedup" -> "normalized", "format" -> "jsonl", "codec" -> "gzip")))
    val gzFiles = new java.io.File(outGz).listFiles.map(_.getName)
    assert(gzFiles.exists(_.endsWith(".json.gz")), gzFiles.mkString(","))
    assert(spark.read.json(outGz).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 4L))
    // the funnel sidecar carries the 3-stage retention accounting
    val f = spark.read.parquet(funnel)
      .select("stage", "n_docs").as[(String, Long)].collect().toMap
    assert(f == Map("ingest" -> 4L, "quality_kept" -> 3L, "exact_unique" -> 2L))
  }

  test("corpus: minhash near-dup mode keeps the min-id doc per component") {
    val shared = "the quick brown fox and the dog walk to a house in the field today fine"
    val docs = Seq(
      (1L, shared, "en"),
      // token-identical (whitespace variant) → shingle Jaccard 1 → the
      // banded candidate join finds it deterministically (probabilistic
      // near-dup recall is DedupSpec's subject, not the CLI wiring's)
      (2L, shared.replace("dog walk", "dog  walk"), "en"),
      (4L, "a completely different long document with many plain words that is fine and the end", "en"))
      .toDF("doc_id", "text", "lang")
    val in = Files.createTempDirectory("cli_corpus_mh").toString + "/docs.parquet"
    docs.write.parquet(in)
    val out = Files.createTempDirectory("cli_corpus_mh_out").toString + "/kept"
    val json = capture(Cli.corpus(spark, Map(
      "docs" -> in, "out" -> out, "min-tokens" -> "3", "dedup" -> "minhash",
      "min-jaccard" -> "0.3"))).trim
    assert(json == """{"n_in":3,"n_quality":3,"n_out":2,"dropped_quality":0,"dropped_dup":1}""")
    val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("corpus: semantic mode dedups via an embeddings sidecar") {
    val docs = Seq(
      // doc 0 FAILS the quality gate (1 token) and is a semantic near-dup
      // of doc 1: pairs must be computed over the kept subset only, or
      // doc 1 would be canonicalized to the vanished doc 0 and deleted
      // with no surviving copy
      (0L, "tiny", "en"),
      (1L, "first document body with plenty of ordinary words to pass the gate fine", "en"),
      (2L, "second document body with plenty of ordinary words to pass the gate too", "en"),
      (3L, "third completely unrelated text with plenty of other words that is fine", "en"))
      .toDF("doc_id", "text", "lang")
    // docs 0/1/2 are collinear → semantic near-dups
    val emb = Seq(
      (0L, Array(0.5f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("cli_corpus_sem").toString
    docs.write.parquet(base + "/docs.parquet")
    emb.write.parquet(base + "/emb.parquet")
    val out = Files.createTempDirectory("cli_corpus_sem_out").toString + "/kept"
    val json = capture(Cli.corpus(spark, Map(
      "docs" -> (base + "/docs.parquet"), "embeddings" -> (base + "/emb.parquet"),
      "out" -> out, "min-tokens" -> "3", "dedup" -> "semantic"))).trim
    assert(json == """{"n_in":4,"n_quality":3,"n_out":2,"dropped_quality":1,"dropped_dup":1}""")
    val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }
}
