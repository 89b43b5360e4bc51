package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet: hive layout, one file per partition, pruning on read") {
    val docs = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"),
      (4L, "delta", "de"), (5L, "epsilon", "fr")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("sink_part").toString
    Sinks.partitionedParquet(docs, dir, Seq("lang"), sortCols = Seq("doc_id"))

    val root = new java.io.File(dir)
    val partDirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(partDirs.toSeq == Seq("lang=de", "lang=en", "lang=fr"))
    // repartition-by-partition-col ⇒ each directory written by ONE task:
    // exactly one data file per partition, not tasks x partitions slivers
    partDirs.foreach { d =>
      val files = new java.io.File(root, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d: ${files.length} files")
    }

    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    val filtered = back.filter(col("lang") === "en")
    assert(filtered.count() == 2)
    // the lang predicate must be answered by partition listing, not a scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
  }

  test("crash debris: orphaned managed locations never poison the next write") {
    // the r15 failure mode: a SIGKILLed bench left
    // spark-warehouse/graft_bm25_postings on disk with NO catalog entry,
    // and every later saveAsTable died with LOCATION_ALREADY_EXISTS.
    // Plant exactly that debris for every table the save paths create,
    // then prove both persistence APIs write through it.
    val dbLoc = spark.catalog.getDatabase(spark.catalog.currentDatabase)
      .locationUri
    def plant(table: String): java.nio.file.Path = {
      spark.sql(s"DROP TABLE IF EXISTS $table") // catalog must NOT know it
      val dir = java.nio.file.Paths.get(
        new java.net.URI(dbLoc).getPath, table.toLowerCase)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("stale.parquet"), "debris")
      dir
    }
    val tables = Seq("graft_bm25_postings", "graft_bm25_termstats",
      "graft_bm25_corpusstats")
    tables.foreach(plant)
    try {
      val corpus = Seq((1L, "red fox"), (2L, "lazy dog red"))
        .toDF("doc_id", "text")
      val idx = graft.operators.Tfidf.buildBm25Index(corpus, "doc_id", "text")
      graft.operators.Tfidf.saveBm25Index(idx, "graft_bm25", buckets = 2)
      // the round-trip reads real data, not the planted junk
      val back = graft.operators.Tfidf.loadBm25Index(spark, "graft_bm25")
      assert(back.corpusStats.collect().head.getLong(0) == 2L)
      // and a second overwrite over the NOW-CATALOGED tables still works
      graft.operators.Tfidf.saveBm25Index(idx, "graft_bm25", buckets = 2)
      // replaceTable alone survives debris too
      plant("graft_debris_plain")
      Sinks.replaceTable(corpus, "graft_debris_plain")
      assert(spark.table("graft_debris_plain").count() == 2L)
    } finally {
      (tables :+ "graft_debris_plain").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Caches.unpersistAll()
    }
  }

  test("staged swap: a FAILED replacement write leaves the old table intact") {
    // r16 ADVICE (medium): the old drop-then-write destroyed the previous
    // table before one replacement row existed. The staged write must
    // fail WITHOUT touching the live table.
    val old = Seq((1L, "keep me")).toDF("doc_id", "text")
    Sinks.replaceTable(old, "graft_swap_fail")
    val bad = Seq((2L, "boom")).toDF("doc_id", "text")
      .withColumn("text", expr("assert_true(doc_id = 1)"))
    try {
      intercept[Throwable] { Sinks.replaceTable(bad, "graft_swap_fail") }
      val back = spark.table("graft_swap_fail").collect()
      assert(back.map(_.getLong(0)).toSeq == Seq(1L), back.mkString(","))
      assert(back.head.getString(1) == "keep me")
      // and the failed stage's debris never poisons the NEXT write
      Sinks.replaceTable(Seq((3L, "new")).toDF("doc_id", "text"),
        "graft_swap_fail")
      assert(spark.table("graft_swap_fail").collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_swap_fail")
      spark.sql("DROP TABLE IF EXISTS graft_swap_fail__stage")
    }
  }

  test("staged swap: SELF-REFERENTIAL replace (append a loaded index onto its own prefix)") {
    // the lifecycle the advice named: load an index, append a batch,
    // save back onto the SAME tables — the stage write reads the live
    // table, so nothing is dropped until the new data exists
    import graft.operators.Tfidf
    val corpus = Seq((1L, "red fox jumps"), (2L, "lazy dog sleeps"))
      .toDF("doc_id", "text")
    try {
      Tfidf.saveBm25Index(Tfidf.buildBm25Index(corpus, "doc_id", "text"),
        "graft_selfref", buckets = 2)
      val batch = Seq((3L, "red dog barks")).toDF("doc_id", "text")
      Tfidf.saveBm25Index(
        Tfidf.appendBm25Index(Tfidf.loadBm25Index(spark, "graft_selfref"),
          batch, "doc_id", "text"),
        "graft_selfref", buckets = 2)
      val back = Tfidf.loadBm25Index(spark, "graft_selfref")
      assert(back.corpusStats.collect().head.getLong(0) == 3L)
      // bit-identical to a fresh build over the union (merge exactness)
      val fresh = Tfidf.buildBm25Index(corpus.unionByName(batch),
        "doc_id", "text")
      def rows(idx: Tfidf.Bm25Index) = idx.postings
        .orderBy("term", "doc").collect().map(_.toSeq).toSeq
      assert(rows(back) == rows(fresh))
    } finally {
      Seq("postings", "termstats", "corpusstats").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_selfref_$t")
        spark.sql(s"DROP TABLE IF EXISTS graft_selfref_${t}__stage")
      }
      graft.operators.Caches.unpersistAll()
    }
  }

  test("ensureWritableTable rejects qualified names") {
    intercept[IllegalArgumentException] {
      Sinks.ensureWritableTable(spark, "somedb.sometable")
    }
  }

  test("recoverSwaps: a crash BETWEEN swaps of a multi-table set rolls forward") {
    // r17 ADVICE (medium): old behavior left a MIXED old/new set. Build
    // the exact state replaceTables leaves if killed after swapping only
    // the first member — stages complete, commit marker present, member
    // 1 renamed, member 2 still old — then prove recovery finishes it.
    def mk(v: String) = Seq((1L, v)).toDF("id", "v")
    try {
      Sinks.replaceTable(mk("old"), "graft_rs_a")
      Sinks.replaceTable(mk("old"), "graft_rs_b")
      // stages for the new version, as replaceTables writes them
      Sinks.ensureWritableTable(spark, "graft_rs_a__stage")
      mk("new").write.format("parquet").saveAsTable("graft_rs_a__stage")
      Sinks.ensureWritableTable(spark, "graft_rs_b__stage")
      mk("new").write.format("parquet").saveAsTable("graft_rs_b__stage")
      // the commit marker certifying every stage write succeeded
      Sinks.ensureWritableTable(spark, "graft_rs_a__swapcommit")
      Seq("graft_rs_a", "graft_rs_b").toDF("member").repartition(1)
        .write.format("parquet").saveAsTable("graft_rs_a__swapcommit")
      // "crash": only member 1's swap ran
      Sinks.ensureWritableTable(spark, "graft_rs_a")
      spark.sql("ALTER TABLE `graft_rs_a__stage` RENAME TO `graft_rs_a`")
      // mixed state: a=new, b=old — recovery must finish b from its stage
      assert(Sinks.recoverSwaps(spark, Seq("graft_rs_a", "graft_rs_b")))
      assert(spark.table("graft_rs_a").collect().head.getString(1) == "new")
      assert(spark.table("graft_rs_b").collect().head.getString(1) == "new")
      assert(!spark.catalog.tableExists("graft_rs_a__swapcommit"))
      // idempotent: a second recovery is a no-op
      assert(!Sinks.recoverSwaps(spark, Seq("graft_rs_a", "graft_rs_b")))
    } finally Seq("graft_rs_a", "graft_rs_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}__stage`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}__swapcommit`")
    }
  }

  test("recoverSwaps: stages WITHOUT a commit marker are never rolled forward") {
    // a crash DURING a stage write leaves (possibly incomplete) stages
    // and no marker — the old set is fully live and must stay served
    def mk(v: String) = Seq((1L, v)).toDF("id", "v")
    try {
      Sinks.replaceTable(mk("old"), "graft_rs_c")
      Sinks.replaceTable(mk("old"), "graft_rs_d")
      Sinks.ensureWritableTable(spark, "graft_rs_c__stage")
      mk("half-written").write.format("parquet")
        .saveAsTable("graft_rs_c__stage")
      assert(!Sinks.recoverSwaps(spark, Seq("graft_rs_c", "graft_rs_d")))
      assert(spark.table("graft_rs_c").collect().head.getString(1) == "old")
      assert(spark.table("graft_rs_d").collect().head.getString(1) == "old")
    } finally Seq("graft_rs_c", "graft_rs_d").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}__stage`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}__swapcommit`")
    }
  }

  test("loadBm25Index repairs a swap that crashed between renames before serving") {
    import graft.operators.Tfidf
    val p = "graft_rsload"
    val docsA = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val docsB = docsA
      .unionByName(Seq((3L, "gamma delta")).toDF("doc_id", "text"))
    val members = Seq(s"${p}_postings", s"${p}_termstats", s"${p}_corpusstats")
    try {
      Tfidf.saveBm25Index(Tfidf.buildBm25Index(docsA, "doc_id", "text"),
        p, buckets = 2)
      // the new version's stages + marker, then a crash after only the
      // postings rename — the exact mixed state the ADVICE described
      // (new postings beside old termstats/corpusstats)
      val idxB = Tfidf.buildBm25Index(docsB, "doc_id", "text")
      val stageWrites = Seq(
        s"${p}_postings" ->
          Sinks.bucketedWriter(idxB.postings, Seq("term"), 2),
        s"${p}_termstats" -> Sinks.parquetWriter(idxB.termStats),
        s"${p}_corpusstats" -> Sinks.parquetWriter(idxB.corpusStats))
      stageWrites.foreach { case (t, w) =>
        Sinks.ensureWritableTable(spark, s"${t}__stage"); w(s"${t}__stage")
      }
      Sinks.ensureWritableTable(spark, s"${p}_postings__swapcommit")
      members.toDF("member").repartition(1)
        .write.format("parquet").saveAsTable(s"${p}_postings__swapcommit")
      Sinks.ensureWritableTable(spark, s"${p}_postings")
      spark.sql(
        s"ALTER TABLE `${p}_postings__stage` RENAME TO `${p}_postings`")
      // load rolls forward: stats must describe the THREE-doc corpus the
      // live postings came from, never the stale two-doc ones
      val idx = Tfidf.loadBm25Index(spark, p)
      assert(idx.corpusStats.collect().head.getLong(0) == 3L)
      assert(idx.postings.select("doc").distinct().count() == 3L)
      assert(!spark.catalog.tableExists(s"${p}_postings__swapcommit"))
    } finally {
      members.foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        spark.sql(s"DROP TABLE IF EXISTS `${t}__stage`")
        spark.sql(s"DROP TABLE IF EXISTS `${t}__swapcommit`")
      }
      graft.operators.Caches.unpersistAll()
    }
  }

  test("bucketed tables: same-key same-count join plans with ZERO exchanges") {
    val left = (1 to 100).map(i => (i.toLong, s"text$i")).toDF("doc_id", "text")
    val right = (1 to 100).map(i => (i.toLong, i % 7)).toDF("doc_id", "score")
    Sinks.bucketedTable(left, "b_left", "doc_id", 4, sortCols = Seq("doc_id"))
    Sinks.bucketedTable(right, "b_right", "doc_id", 4, sortCols = Seq("doc_id"))
    // force the sort-merge path (broadcast would trivially avoid the
    // exchange and prove nothing about the bucketing layout)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_left").join(spark.table("b_right"), "doc_id")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
