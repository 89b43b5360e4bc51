package graft

import graft.dbt.DbtLoader
import graft.model.SamplingConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI facade over the engine — the user surface of the reference's
  * `querysight.py analyze|export` (851 LoC of click handlers) reduced to
  * a thin arg parser around [[Analyze]]. A reference user's invocation
  *
  *   querysight analyze --days 7 --min-frequency 2 --focus slow \
  *       --include-users alice --select-patterns a1,b2 --select-tables t \
  *       --select-models m --min-duration 500 --sample-size 0.5 \
  *       --sort-by frequency --dbt-project ./proj --cache-dir ./cache
  *
  * maps 1:1 onto:
  *
  *   runMain graft.Cli analyze --logs <parquet> --days 7 --min-frequency 2
  *       --focus slow --users alice --select-patterns a1,b2
  *       --select-tables t --select-models m --min-duration 500
  *       --sample-size 0.5 --sort-by frequency
  *       --dbt-project ./proj --store ./cache [--schema-dir <dir>]
  *
  * `export` reads the persisted pattern history (S9,
  * `querysight.py:815-848`) and prints JSON.
  */
object Cli {

  /** Boolean flags that may appear with no value (click's is_flag style,
    * `querysight.py:291-292`). `cache` is listed because the reference's
    * `--cache/--no-cache` toggle allows a bare `--cache`; it still accepts
    * an explicit value (`--cache false`). */
  private val BareFlags = Set("force-reset", "no-cache", "cache")

  /** `--key value` pairs plus the known bare boolean flags ([[BareFlags]],
    * which parse as `key=true` when no value follows). Any OTHER `--key`
    * with no value is a parse error — previously `analyze --logs` yielded
    * logs="true" which flowed downstream as a file path and died with a
    * confusing read error. `--key=value` is the escape hatch for values
    * that themselves start with `--`. */
  private def parseArgs(args: Seq[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument: $a")
      val k = a.stripPrefix("--")
      if (k.contains('=')) {
        val Array(key, value) = k.split("=", 2)
        out(key) = value; i += 1
      } else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        // sbt's runMain passes shell-style quotes through literally
        out(k) = args(i + 1).stripPrefix("'").stripSuffix("'"); i += 2
      } else if (BareFlags(k)) { out(k) = "true"; i += 1 }
      else sys.error(s"missing value for --$k (use --$k=<value> if the " +
        "value starts with --)")
    }
    out.toMap
  }

  /** First present key wins — reference spellings alias engine spellings
    * (`--include-users`≡`--users`, `--query-kinds`≡`--kinds`). */
  private def opt(opts: Map[String, String], keys: String*): Option[String] =
    keys.collectFirst { case k if opts.contains(k) => opts(k) }

  private[graft] def parseArgsForTest(args: Seq[String]): Map[String, String] =
    parseArgs(args)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli analyze|export --logs <path> [options]")
    val cmd = args.head
    val opts = parseArgs(args.tail.toSeq)
    // shared session defaults (GraftSession scaladoc); the CLI's master
    // and shuffle-partition count stay caller-configurable
    val spark = GraftSession.builder(opts.getOrElse("shuffle-partitions", "8"))
      .master(opts.getOrElse("master", "local[8]"))
      // tolerate TIMESTAMP(NANOS) parquet inputs (read as long nanos)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try cmd match {
      case "analyze" => analyze(spark, opts)
      case "export" => exportLatest(spark, opts)
      case "generate-model" => generateModel(spark, opts)
      case "corpus" => corpus(spark, opts)
      case other =>
        sys.error(s"unknown command: $other (analyze|export|generate-model|corpus)")
    } finally spark.stop()
  }

  private def csv(opts: Map[String, String], key: String): Seq[String] =
    opts.get(key).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  private[graft] def analyze(spark: SparkSession, opts: Map[String, String]): Unit = {
    // Acquisition seam: parquet (primary) or an external warehouse over
    // JDBC (the reference's ClickHouse socket, data_acquisition.py:24-45).
    val logs = opts.get("jdbc-url") match {
      case Some(u) =>
        graft.sources.JdbcLogSource(u, opts.getOrElse("jdbc-table", "query_log"))
          .load(spark)
      case None => graft.sources.ParquetLogSource(opts("logs")).load(spark)
    }
    val cfg = SamplingConfig(
      days = opts.get("days").map(_.toInt),
      includeUsers = opt(opts, "users", "include-users").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
      excludeUsers = csv(opts, "exclude-users"),
      queryKinds = opt(opts, "kinds", "query-kinds").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
      slowOnlyThresholdMs = opts.get("slow-ms").map(_.toDouble))
    val project = opts.get("dbt-project").map(DbtLoader.load)
    // `--level` by numeral or by reference name (`querysight.py:293`).
    val level = opts.getOrElse("level", "4").toLowerCase match {
      case "1" | "data_collection" => AnalysisLevel.DataCollection
      case "2" | "pattern_analysis" => AnalysisLevel.PatternAnalysis
      case "3" | "dbt_integration" => AnalysisLevel.DbtIntegration
      case "4" | "optimization" => AnalysisLevel.Optimization
      case other => sys.error(s"unknown level: $other")
    }
    val asOf = opts.get("as-of")
      .map(s => if (s.contains(' ')) s else s + " 00:00:00")
      .map(s => lit(java.sql.Timestamp.valueOf(s)))
      .getOrElse(current_timestamp())
    // Post-aggregation pattern criteria (querysight.py:295-297,341-357).
    val criteria = graft.operators.Filters.PatternCriteria(
      patternIds = csv(opts, "select-patterns"),
      minAvgDurationMs = opts.get("min-duration").map(_.toDouble),
      selectTables = csv(opts, "select-tables"),
      selectModels = csv(opts, "select-models"))
    // --schema-dir <testdata dir>: feed table schemas into recommendations
    // so INDEX rules can name columns (ai_suggester.py:56-63).
    val schemas = opts.get("schema-dir").map { dir =>
      graft.sources.Schemas.describeTables(spark, dir,
        graft.sources.Tables.all)
    }
    val res = Analyze.run(logs, cfg, project, level, asOf,
      minFrequency = opts.getOrElse("min-frequency", "2").toInt,
      focus = QueryFocus.parse(opts.getOrElse("focus", "all")),
      criteria = criteria,
      sampleFraction = opts.get("sample-size").map(_.toDouble).filter(_ < 1.0),
      schemas = schemas)

    // Cache controls (`querysight.py:291-292`): `--force-reset` wipes the
    // store before this run's merge; `--no-cache` (or `--cache false`)
    // bypasses the store entirely — nothing read, nothing written. The
    // reset is NOT gated on the cache flag: the reference wipes whenever
    // force_reset is set (initialize_analysis_components, querysight.py:313,
    // cache_manager.py:26), so `--no-cache --force-reset` still clears.
    val useCache = !opts.get("no-cache").contains("true") &&
      !opts.get("cache").contains("false")
    opts.get("store").foreach { dir =>
      if (opts.get("force-reset").contains("true"))
        graft.operators.PatternStore.reset(dir)
    }
    opts.get("store").filter(_ => useCache && level.ordinal >= 2).foreach { dir =>
      val history = res.patterns.select(
        col("pattern_id"), col("sql_pattern"), col("frequency"),
        col("total_duration_ms"), col("avg_duration_ms"),
        col("first_seen"), col("last_seen"), col("users"),
        col("memory_usage"), col("total_read_rows"), col("total_read_bytes"))
      graft.operators.PatternStore.enrich(spark, history, dir)
    }

    // Output: the reference's rich display is the default
    // (`display_analysis_results`, querysight.py:679-748); `--format json`
    // keeps the machine-readable surface.
    if (opts.getOrElse("format", "table") == "json") {
      println(Analyze.exportJson(res, topN = opts.getOrElse("top", "20").toInt,
        sortBy = opts.getOrElse("sort-by", "impact")))
      res.coverage.foreach(c => println(c.toJSON.collect().mkString("[", ",", "]")))
      res.recommendations.foreach(r =>
        println(r.orderBy("pattern_id", "rec_type").toJSON.collect().mkString("[", ",", "]")))
    } else {
      val sortBy = opts.getOrElse("sort-by", "duration")
      val pageSize = opts.getOrElse("page-size", "20").toInt
      val levelName = level match {
        case AnalysisLevel.DataCollection => "data_collection"
        case AnalysisLevel.PatternAnalysis => "pattern_analysis"
        case AnalysisLevel.DbtIntegration => "dbt_integration"
        case AnalysisLevel.Optimization => "optimization"
      }
      level match {
        case AnalysisLevel.DataCollection =>
          println("Data collection completed successfully")
        case AnalysisLevel.PatternAnalysis =>
          println(Display.patternTableCompact(res.patterns, sortBy))
        case _ =>
          println("Analysis Complete!\n")
          println("Query Pattern Analysis")
          println(Display.queryPatterns(res.patterns, sortBy, pageSize))
          if (project.isDefined && res.coverage.isDefined) {
            println("DBT Model Coverage")
            val pc = project.map(p => graft.operators.Mapping.parentChild(
              graft.operators.Mapping.modelsDf(spark, p),
              graft.operators.Mapping.edgesDf(spark, p)))
            println(Display.modelCoverage(res.patterns, pc))
          }
          res.recommendations.foreach(r => println(Display.recommendations(r)))
          println(Display.summaryPanel(levelName))
      }
    }
  }

  /** `generate-model`: dbt scaffolds for uncovered tables. The reference
    * ADVERTISES this command (`querysight.py:277`) but never implements
    * it; this one works — see [[graft.operators.ModelGen]]. With
    * `--output <dir>` writes `<model>.sql` + `<model>.yml` files;
    * otherwise prints JSON. `--table` narrows to one table. */
  private[graft] def generateModel(spark: SparkSession, opts: Map[String, String]): Unit = {
    val logs = opts.get("jdbc-url") match {
      case Some(u) =>
        graft.sources.JdbcLogSource(u, opts.getOrElse("jdbc-table", "query_log")).load(spark)
      case None => graft.sources.ParquetLogSource(opts("logs")).load(spark)
    }
    val project = DbtLoader.load(opts("dbt-project"))
    val asOf = opts.get("as-of")
      .map(s => if (s.contains(' ')) s else s + " 00:00:00")
      .map(s => lit(java.sql.Timestamp.valueOf(s)))
      .getOrElse(current_timestamp())
    val res = Analyze.run(logs, SamplingConfig(days = opts.get("days").map(_.toInt)),
      Some(project), AnalysisLevel.DbtIntegration, asOf,
      minFrequency = opts.getOrElse("min-frequency", "2").toInt)
    val schemas = opts.get("schema-dir").map(dir =>
      graft.sources.Schemas.describeTables(spark, dir, graft.sources.Tables.all))
    val all = graft.operators.ModelGen.scaffolds(res.patterns, schemas)
    val selected = opts.get("table").fold(all)(t => all.filter(col("table_name") === t))
    opts.get("output") match {
      case Some(dir) =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        // scaffold count = uncovered-table count: small by construction
        selected.collect().foreach { r =>
          val name = r.getAs[String]("model_name")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.sql"), r.getAs[String]("model_sql"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.yml"), r.getAs[String]("schema_yml"))
          println(s"generated $dir/$name.sql")
        }
      case None =>
        println(selected.toJSON.collect().mkString("[", ",", "]"))
    }
  }

  /** S9: `export [--output <file>]` (`querysight.py:815-848`) — latest
    * persisted patterns as JSON, to stdout or a file. */
  /** `corpus`: the training-data surface as a one-shot tool — quality gate
    * (configurable thresholds) → optional dedup (exact|normalized|none) →
    * kept docs written as parquet to `--out`, plus a one-line JSON summary
    * on stdout (counts per stage).
    *
    *   runMain graft.Cli corpus --docs <parquet> --out <dir>
    *       [--min-tokens 10] [--langs en,de] [--dedup normalized]
    */
  private[graft] def corpus(spark: SparkSession, opts: Map[String, String]): Unit = {
    import graft.operators.{Dedup, QualityFilter}
    val docs = spark.read.parquet(opts("docs"))
    val cfg = QualityFilter.Config(
      minTokens = opts.getOrElse("min-tokens", "10").toLong,
      maxTokens = opts.getOrElse("max-tokens", "100000").toLong,
      allowedLangs = Some(csv(opts, "langs")).filter(_.nonEmpty)
        .getOrElse(QualityFilter.Config().allowedLangs))
    val verdicts = QualityFilter(docs, "doc_id", "text", "lang", cfg)
    val kept = docs.join(
      verdicts.filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    val deduped = opts.getOrElse("dedup", "normalized") match {
      case "none" => kept
      // near-dup modes: pair generation → components → keep-list
      case "minhash" =>
        val pairs = Dedup.minhashNearDups(kept, "doc_id", "text",
          minEstJaccard = opts.getOrElse("min-jaccard", "0.5").toDouble)
          .select("doc_a", "doc_b")
        Dedup.keepCanonical(kept, "doc_id", pairs)
      // SemDeDup over a sibling embeddings table (--embeddings <path>,
      // vec_id aligned with doc_id). Pairs are computed over the
      // QUALITY-KEPT subset only, like the minhash branch: a pair against
      // a quality-dropped doc would otherwise delete the surviving copy
      // too (its canonical partner no longer exists in the corpus).
      case "semantic" =>
        val emb = spark.read.parquet(opts.getOrElse("embeddings",
          sys.error("--dedup semantic requires --embeddings <path>")))
          .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi")
        val pairs = Dedup.semanticDedup(emb, "vec_id", "embedding",
          threshold = opts.getOrElse("threshold", "0.95").toDouble)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        Dedup.keepCanonical(kept, "doc_id", pairs)
      case mode @ ("exact" | "normalized") =>
        val fp = if (mode == "exact") md5(col("text"))
          else md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fp).orderBy(col("doc_id"))
        kept.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      case other => sys.error(
        s"unknown dedup mode: $other (none|exact|normalized|minhash|semantic)")
    }
    val out = opts("out")
    // --format jsonl: trainer hand-off shards instead of parquet
    opts.getOrElse("format", "parquet") match {
      case "parquet" => deduped.write.mode("overwrite").parquet(out)
      case "jsonl" => graft.sources.Sinks.jsonlShards(deduped, out,
        maxRecordsPerFile = opts.getOrElse("shard-records", "100000").toLong,
        codec = opts.getOrElse("codec", "zstd"))
      case other => sys.error(s"unknown format: $other (parquet|jsonl)")
    }
    // --funnel <path>: persist the stage retention report next to the run
    opts.get("funnel").foreach { p =>
      graft.operators.CorpusReport.funnel(docs, "doc_id", "text", "lang")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
    val nIn = docs.count()
    val nKept = kept.count()
    val nFinal = deduped.count()
    println(s"""{"n_in":$nIn,"n_quality":$nKept,"n_out":$nFinal,""" +
      s""""dropped_quality":${nIn - nKept},"dropped_dup":${nKept - nFinal}}""")
  }

  private[graft] def exportLatest(spark: SparkSession, opts: Map[String, String]): Unit = {
    val dir = opts("store")
    graft.operators.PatternStore.load(spark, dir) match {
      case Some(df) =>
        val json = df.orderBy(desc("frequency"), col("pattern_id"))
          .toJSON.collect().mkString("[", ",", "]")
        opts.get("output") match {
          case Some(file) =>
            java.nio.file.Files.writeString(java.nio.file.Paths.get(file), json)
            println(s"exported ${json.length} bytes to $file")
          case None => println(json)
        }
      case None => sys.error(s"no pattern history at $dir")
    }
  }
}
