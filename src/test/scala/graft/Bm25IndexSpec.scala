package graft

import graft.operators.Tfidf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Tfidf.Bm25Index]] — the sparse-retrieval serve/build split. The
  * load-bearing properties: serving a pre-built index is BIT-IDENTICAL
  * to the inline search (same exact-integer inputs, same IEEE chain);
  * merging indexes built over disjoint doc sets equals the full rebuild
  * component-by-component AND rank-by-rank; and the row-local postings
  * path (the streaming twin's map-only shape) emits exactly the
  * shuffle-built postings. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  // repeated terms (tf > 1), shared vocabulary (df > 1), length spread
  // (dl variation drives the BM25 normalization), and a term unique to
  // one doc — the corners the weight chain has to get right
  private def corpus: DataFrame = Seq(
    (1L, "red fox red fox red dog"),
    (2L, "red dog jumps over the lazy dog"),
    (3L, "lazy fox sleeps"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"),
    (5L, "unique sentinel phrase"),
    (6L, "dog dog dog dog red")).toDF("doc_id", "text")

  private def queries: DataFrame = Seq(
    (10L, "red fox"), (20L, "lazy dog"), (30L, "unique sentinel"),
    (40L, "absent terms only zzz")).toDF("query_id", "qtext")

  private def ranked(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("query_id", "doc", "score_c", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("served == inline: byte-identical ranks, scores, and rows") {
    val inline = Tfidf.searchBm25(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 3)
    val served = Tfidf.searchBm25Served(
      Tfidf.buildBm25Index(corpus, "doc_id", "text"),
      queries, "query_id", "qtext", k = 3)
    val got = ranked(served)
    assert(got.nonEmpty && got == ranked(inline), got.mkString("\n"))
    // the query whose terms are absent from the corpus returns nothing
    assert(!got.exists(_._1 == 40L))
  }

  test("merge over disjoint doc sets == full rebuild, component by component") {
    val a = Tfidf.buildBm25Index(corpus.filter(col("doc_id") <= 3),
      "doc_id", "text")
    val b = Tfidf.buildBm25Index(corpus.filter(col("doc_id") > 3),
      "doc_id", "text")
    val merged = Tfidf.mergeBm25Index(a, b)
    val full = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    def postings(i: Tfidf.Bm25Index) = i.postings.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    def stats(i: Tfidf.Bm25Index) = i.termStats.collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    def totals(i: Tfidf.Bm25Index) = i.corpusStats.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(postings(merged) == postings(full))
    assert(stats(merged) == stats(full))
    assert(totals(merged) == totals(full))
    // and the serve path over the merged index is rank-identical
    val overMerged = ranked(Tfidf.searchBm25Served(merged, queries,
      "query_id", "qtext", k = 3))
    val overFull = ranked(Tfidf.searchBm25Served(full, queries,
      "query_id", "qtext", k = 3))
    assert(overMerged.nonEmpty && overMerged == overFull)
  }

  test("appendBm25Index is idempotent: a replayed batch never double-counts") {
    val old = corpus.filter(col("doc_id") <= 4)
    // the batch OVERLAPS the index (docs 3-4 already indexed) — the
    // at-least-once shape mergeBm25Index's raw contract forbids
    val batch = corpus.filter(col("doc_id") >= 3)
    val once = Tfidf.appendBm25Index(
      Tfidf.buildBm25Index(old, "doc_id", "text"), batch, "doc_id", "text")
    val twice = Tfidf.appendBm25Index(once, batch, "doc_id", "text")
    val full = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    def stats(i: Tfidf.Bm25Index) = i.corpusStats.collect().head
    assert(stats(once).getLong(0) == 6L && stats(twice).getLong(0) == 6L)
    def serveRows(i: Tfidf.Bm25Index) = ranked(
      Tfidf.searchBm25Served(i, queries, "query_id", "qtext", k = 3))
    val want = serveRows(full)
    assert(want.nonEmpty && serveRows(once) == want &&
      serveRows(twice) == want)
  }

  test("deleteBm25Index == rebuild over the remaining corpus; idempotent; total delete") {
    def postings(i: Tfidf.Bm25Index) = i.postings.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    def stats(i: Tfidf.Bm25Index) = i.termStats.collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    def totals(i: Tfidf.Bm25Index) = i.corpusStats.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    val tombs = corpus.filter(col("doc_id") % 2 === 0).select("doc_id")
    val deleted = Tfidf.deleteBm25Index(full, tombs, "doc_id")
    val rebuilt = Tfidf.buildBm25Index(
      corpus.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
    // delete == rebuild EXACTLY: postings, per-term df (terms whose df
    // hits zero vanish), and the corpus totals BM25 normalizes by
    assert(postings(deleted) == postings(rebuilt))
    assert(stats(deleted) == stats(rebuilt))
    assert(totals(deleted) == totals(rebuilt))
    // …and so does serving (stale-stats bugs would surface here)
    val overDeleted = ranked(Tfidf.searchBm25Served(deleted, queries,
      "query_id", "qtext", k = 3))
    assert(overDeleted.nonEmpty && overDeleted == ranked(
      Tfidf.searchBm25Served(rebuilt, queries, "query_id", "qtext", k = 3)))
    // idempotent: deleting already-gone ids is a no-op (zero deltas)
    val again = Tfidf.deleteBm25Index(deleted, tombs, "doc_id")
    assert(postings(again) == postings(deleted) &&
      stats(again) == stats(deleted) && totals(again) == totals(deleted))
    // deleting everything leaves a structurally empty index
    val none = Tfidf.deleteBm25Index(full, corpus.select("doc_id"), "doc_id")
    assert(postings(none).isEmpty && stats(none).isEmpty &&
      totals(none) == Seq((0L, 0L)))
  }

  test("empty-batch merge is the identity (null-safe corpus totals)") {
    val full = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    // an empty build's corpusStats row is (0, NULL) — sum over no rows —
    // and merge must absorb it without nulling the real totals
    val empty = Tfidf.buildBm25Index(corpus.filter(lit(false)),
      "doc_id", "text")
    val merged = Tfidf.mergeBm25Index(full, empty)
    val t = merged.corpusStats.collect().head
    assert(!t.isNullAt(0) && !t.isNullAt(1))
    assert(t.getLong(0) == 6L)
    val got = ranked(Tfidf.searchBm25Served(merged, queries,
      "query_id", "qtext", k = 3))
    assert(got == ranked(Tfidf.searchBm25Served(full, queries,
      "query_id", "qtext", k = 3)))
  }

  test("bench serve seam: q_bm25_served over prebuilt tables == inline mode") {
    // the graft.bench.sparseIndex conf flips SparkEntry's q_bm25_served
    // onto pre-built graft_bm25_* tables — the timed serve path must
    // return exactly what the inline (Verify/oracle) mode returns
    val dir = "/root/testdata/sf0.001"
    val tables = Seq("postings", "termstats", "corpusstats", "queries",
      "positional")
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_bm25_$t"))
    try {
      val inline = SparkEntry.queries("q_bm25_served")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val inlinePhrase = SparkEntry.queries("q_phrase_search")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val inlineSlop = SparkEntry.queries("q_phrase_slop")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val docs = graft.sources.Tables.documents(spark, dir)
      val idx = Tfidf.buildBm25Index(docs, "doc_id", "text")
      graft.sources.Sinks.bucketedTableOn(idx.postings,
        "graft_bm25_postings", Seq("term"), 8)
      graft.sources.Sinks.replaceTable(idx.termStats, "graft_bm25_termstats")
      graft.sources.Sinks.replaceTable(idx.corpusStats,
        "graft_bm25_corpusstats")
      graft.sources.Sinks.replaceTable(
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
          .select(col("doc_id").as("query_id"),
            array_join(slice(graft.functions.Text.tokens(
              lower(col("text"))), 1, 3), " ").as("qtext")),
        "graft_bm25_queries")
      Tfidf.savePositionalIndex(
        Tfidf.positionalPostings(docs, "doc_id", "text"), "graft_bm25", 8)
      spark.conf.set("graft.bench.sparseIndex", "1")
      val served = SparkEntry.queries("q_bm25_served")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(served.nonEmpty && served == inline)
      // the phrase + slop queries ride the same seam against the
      // positional table (loadPositionalIndex round-trip included)
      assert(Tfidf.loadPositionalIndex(spark, "graft_bm25").columns
        .contains("positions"))
      val servedPhrase = SparkEntry.queries("q_phrase_search")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(servedPhrase.nonEmpty && servedPhrase == inlinePhrase)
      val servedSlop = SparkEntry.queries("q_phrase_slop")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(servedSlop.nonEmpty && servedSlop == inlineSlop)
    } finally {
      spark.conf.unset("graft.bench.sparseIndex")
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_bm25_$t"))
      graft.operators.Caches.unpersistAll()
    }
  }

  test("positional index lifecycle: append == rebuild, idempotent; delete == rebuild, idempotent") {
    import graft.operators.Tfidf
    val a = Seq((1L, "red fox jumps high"), (2L, "lazy dog red fox"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "red fox red fox"), (3L, "red fox red fox"))
      .toDF("doc_id", "text") // in-batch duplicate: must not double postings
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("term", "doc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Int](4).toSeq)).toSeq
    val idxA = Tfidf.positionalPostings(a, "doc_id", "text")
    val appended = Tfidf.appendPositionalIndex(idxA, b, "doc_id", "text")
    val rebuilt = Tfidf.positionalPostings(
      a.unionByName(b.dropDuplicates("doc_id")), "doc_id", "text")
    assert(rows(appended) == rows(rebuilt))
    // replay idempotence: the whole batch anti-joins to nothing
    assert(rows(Tfidf.appendPositionalIndex(appended, b, "doc_id", "text"))
      == rows(appended))
    // delete == rebuild over the remaining docs; absent ids are a no-op
    val tombs = Seq(2L, 99L).toDF("doc_id")
    val deleted = Tfidf.deletePositionalIndex(appended, tombs, "doc_id")
    val remaining = Tfidf.positionalPostings(
      a.filter(col("doc_id") =!= 2L).unionByName(b.dropDuplicates("doc_id")),
      "doc_id", "text")
    assert(rows(deleted) == rows(remaining))
    assert(rows(Tfidf.deletePositionalIndex(deleted, tombs, "doc_id"))
      == rows(deleted))
  }

  test("positional postings: hand-checked positions; tf == |positions|; Σtf == dl") {
    val docs = Seq((1L, "red fox red fox red dog")).toDF("doc_id", "text")
    val got = Tfidf.positionalPostings(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(2),
        r.getSeq[Int](4).toSeq, r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("dog", 1L, Seq(5), 6L),
      ("fox", 2L, Seq(1, 3), 6L),
      ("red", 3L, Seq(0, 2, 4), 6L)), got.mkString("\n"))
    assert(got.map(_._2).sum == 6L) // Σtf == dl
    // dropping positions recovers the plain postings row exactly
    val plain = Tfidf.postingsRowLocal(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val viaPositional = Tfidf.positionalPostings(docs, "doc_id", "text")
      .select("term", "doc", "tf", "dl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(plain == viaPositional)
  }

  test("bm25IndexFromPostings == buildBm25Index, frame for frame") {
    // the r18 shared-pass derivation (q_phrase_ranked / sparse prebuild):
    // every index frame must carry the SAME exact integers as the
    // shuffle-built form — scores are then bit-identical by construction
    val built = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    val derived = Tfidf.bm25IndexFromPostings(
      Tfidf.positionalPostings(corpus, "doc_id", "text"))
    def rows(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(rows(built.postings.select("term", "doc", "tf", "dl")) ==
      rows(derived.postings.select("term", "doc", "tf", "dl")))
    assert(rows(built.termStats) == rows(derived.termStats))
    assert(rows(built.corpusStats) == rows(derived.corpusStats))
    // and the served ranking over the derived index is byte-identical
    val a = ranked(Tfidf.searchBm25Served(built, queries, "query_id",
      "qtext", k = 3))
    val b = ranked(Tfidf.searchBm25Served(derived, queries, "query_id",
      "qtext", k = 3))
    assert(a == b && a.nonEmpty)
  }

  test("phrase search: overlap, repeated terms, cross-doc, absent, single-term") {
    val docs = Seq(
      (1L, "the dog dog dog barks"),    // "dog dog" overlaps twice
      (2L, "a red fox and a red fox"),  // "red fox" twice, non-adjacent
      (3L, "red dog fox"),              // terms present, phrase absent
      (4L, "dog")).toDF("doc_id", "text")
    val postings = Tfidf.positionalPostings(docs, "doc_id", "text")
    def search(qs: Seq[(Long, String)]) =
      Tfidf.phraseSearch(postings, qs.toDF("query_id", "qtext"),
          "query_id", "qtext")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    // overlapping matches count individually; repeated phrase terms work
    assert(search(Seq((10L, "dog dog"))) == Seq((10L, 1L, 2L)))
    // multi-doc retrieval with per-doc counts
    assert(search(Seq((11L, "red fox"))) == Seq((11L, 2L, 2L)))
    // order matters: "fox and" matches doc 2, its reversal matches nothing
    assert(search(Seq((12L, "fox and"))) == Seq((12L, 2L, 1L)))
    assert(search(Seq((16L, "and fox"))).isEmpty)
    // all terms present somewhere but never consecutive -> no row
    assert(search(Seq((13L, "dog barks red"))).isEmpty)
    // single-term phrase degenerates to term lookup: n_matches == tf
    assert(search(Seq((14L, "dog"))) ==
      Seq((14L, 1L, 3L), (14L, 3L, 1L), (14L, 4L, 1L)))
    // absent vocabulary -> empty, not an error
    assert(search(Seq((15L, "zzz yyy"))).isEmpty)
  }

  test("adaptive phrase intersection: dfStats on == off, row for row") {
    // one rare term ("needle", df=2) + common terms in every doc — the
    // skewed query flags (2 <= 0.1 * (2+62+62)), the uniform one refuses;
    // BOTH must return exactly what the direct plan returns
    val docs = ((1L to 60L).map(i => (i, s"alpha beta filler$i")) ++
      Seq((61L, "needle alpha beta"), (62L, "alpha needle beta")))
      .toDF("doc_id", "text")
    val postings = Tfidf.positionalPostings(docs, "doc_id", "text")
    val stats = Tfidf.buildBm25Index(docs, "doc_id", "text").termStats
    val qs = Seq((1L, "needle alpha"), (2L, "alpha beta"))
      .toDF("query_id", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val direct = rows(Tfidf.phraseSearch(postings, qs, "query_id", "qtext"))
    val adaptive = rows(Tfidf.phraseSearch(postings, qs, "query_id",
      "qtext", dfStats = Some(stats)))
    assert(direct.nonEmpty && adaptive == direct,
      s"adaptive=$adaptive direct=$direct")
    // both query shapes present in the result (skewed matched doc 61,
    // uniform matched the whole corpus)
    assert(direct.map(_._1).distinct == Seq(1L, 2L))
    val directS = rows(Tfidf.phraseSlopSearch(postings, qs, "query_id",
      "qtext", slop = 1))
    val adaptiveS = rows(Tfidf.phraseSlopSearch(postings, qs, "query_id",
      "qtext", slop = 1, dfStats = Some(stats)))
    assert(directS.nonEmpty && adaptiveS == directS)
    graft.operators.Caches.unpersistAll()
  }

  test("slop search: window semantics, k=0 == exact phrase, hand-checked cases") {
    val docs = Seq(
      (1L, "red big fox"),       // one insertion between the terms
      (2L, "red fox"),           // exact adjacency
      (3L, "fox red"),           // transposed: x values {1-0=1? no: red@1-0, fox@0-1}
      (4L, "red far away fox"),  // gap of two
      (5L, "fox alone")).toDF("doc_id", "text")
    val postings = Tfidf.positionalPostings(docs, "doc_id", "text")
    def slop(k: Int, qs: Seq[(Long, String)]) =
      Tfidf.phraseSlopSearch(postings, qs.toDF("query_id", "qtext"),
          "query_id", "qtext", slop = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val q = Seq((10L, "red fox"))
    // slop 0 == exact phrase, row for row (including counts)
    val exact = Tfidf.phraseSearch(postings, q.toDF("query_id", "qtext"),
        "query_id", "qtext")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(slop(0, q) == exact && exact.map(_._2) == Seq(2L))
    // slop 1 additionally admits one insertion ("red big fox": x = {0, 1})
    // and the transposition ("fox red": x = {1, -1}? no — red@1→x=1,
    // fox@0→x=-1, window width 2 > 1, so doc 3 stays out)
    assert(slop(1, q).map(_._2) == Seq(1L, 2L))
    // slop 2 admits the transposition and the two-token gap
    assert(slop(2, q).map(_._2) == Seq(1L, 2L, 3L, 4L))
    // absent vocabulary -> empty, not an error
    assert(slop(3, Seq((11L, "zzz yyy"))).isEmpty)
    graft.operators.Caches.unpersistAll()
  }

  test("candidate pre-filter keeps the quota where post-filtering starves") {
    // six docs all share the query's terms; candidates admit three. The
    // PRE-filter must return the BM25 top-k AMONG the admitted three;
    // post-filtering an unfiltered top-2 can keep at most the admitted
    // subset of 2 already-chosen rows — fewer when selectivity bites
    val corpus = Seq(
      (1L, "red fox one"), (2L, "red fox two two"), (3L, "red fox three"),
      (4L, "red fox four"), (5L, "red fox five"), (6L, "red fox six"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "red fox")).toDF("query_id", "qtext")
    val idx = Tfidf.buildBm25Index(corpus, "doc_id", "text")
    val cands = Seq((10L, 2L), (10L, 4L), (10L, 6L)).toDF("query_id", "doc")
    val pre = Tfidf.searchBm25Served(idx, qs, "query_id", "qtext", k = 2,
      candidates = Some(cands))
    val preDocs = pre.collect().map(_.getAs[Long]("doc")).toSet
    // quota filled from admitted docs only
    assert(preDocs.size == 2 && preDocs.subsetOf(Set(2L, 4L, 6L)), preDocs)
    // post-filter starves: the unfiltered top-2 ranks by score then id —
    // intersecting it with the admitted set keeps fewer than k
    val unfiltered = Tfidf.searchBm25Served(idx, qs, "query_id", "qtext",
      k = 2).collect().map(_.getAs[Long]("doc")).toSet
    assert((unfiltered & Set(2L, 4L, 6L)).size < 2, unfiltered)
    // and pre-filtered scores equal the unrestricted scores of the same
    // docs (the filter admits rows, never changes arithmetic)
    val all = Tfidf.searchBm25Served(idx, qs, "query_id", "qtext", k = 6)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("score_c"))
      .toMap
    pre.collect().foreach(r =>
      assert(r.getAs[Long]("score_c") == all(r.getAs[Long]("doc"))))
  }

  test("WAND pruning: identical results, measurably fewer scored rows") {
    // corpus engineered so MaxScore bites: "common" appears everywhere
    // (low ub, long postings), "sentinel" in few docs (high ub). For
    // query "sentinel common" with k=2, θ from the rarest term's seeds
    // certifies common-only docs can't enter the top-k — they must be
    // pruned, and the result must not change.
    val docs = (1L to 60L).map { i =>
      if (i <= 3) (i, "sentinel common word extra")
      else (i, "common word filler text " + ("pad " * (i % 5).toInt))
    }.toDF("doc_id", "text")
    val qs = Seq((1L, "sentinel common")).toDF("query_id", "qtext")
    val idx = Tfidf.buildBm25Index(docs, "doc_id", "text")
    val pruned = ranked(Tfidf.searchBm25Served(idx, qs, "query_id", "qtext",
      k = 2, wandPrune = true))
    val unpruned = ranked(Tfidf.searchBm25Served(idx, qs, "query_id", "qtext",
      k = 2, wandPrune = false))
    assert(pruned.nonEmpty && pruned == unpruned,
      s"pruned=$pruned unpruned=$unpruned")
    val (full, admitted, nFlagged) = Tfidf.bm25WandCensus(idx, qs,
      "query_id", "qtext", k = 2)
    // the pre-flight flags the query (sentinel df=3 vs Σdf=63: skewed),
    // every doc matches "common" (60 rows) + 3 sentinel rows = 63 full,
    // and admitted must collapse to the sentinel docs' rows only
    assert(nFlagged == 1L, s"nFlagged=$nFlagged")
    assert(full == 63L, s"full=$full")
    assert(admitted < full && admitted <= 6L, s"admitted=$admitted of $full")
    // a uniform-df batch is REFUSED by the pre-flight: identical rows in,
    // identical rows out, no seed pass (the measured ×50 pathology)
    val uniformQ = Seq((3L, "common word")).toDF("query_id", "qtext")
    val (uf, up, un) = Tfidf.bm25WandCensus(idx, uniformQ,
      "query_id", "qtext", k = 2)
    assert(un == 0L && uf == up, s"uniform: full=$uf pruned=$up flagged=$un")
    // mixed batch: the flagged query prunes, the uniform one passes
    // through, and BOTH return exactly the unpruned results
    val mixed = Seq((1L, "sentinel common"), (3L, "common word"))
      .toDF("query_id", "qtext")
    val mp = ranked(Tfidf.searchBm25Served(idx, mixed, "query_id", "qtext",
      k = 2, wandPrune = true))
    val mu = ranked(Tfidf.searchBm25Served(idx, mixed, "query_id", "qtext",
      k = 2, wandPrune = false))
    assert(mp.nonEmpty && mp == mu, s"mixed pruned=$mp unpruned=$mu")
    // and on a query where θ can't certify anything (fewer than k seed
    // docs), pruning is a no-op, not a wrong answer
    val qsNoSeed = Seq((2L, "sentinel")).toDF("query_id", "qtext")
    val a = ranked(Tfidf.searchBm25Served(idx, qsNoSeed, "query_id", "qtext",
      k = 5, wandPrune = true))
    val b2 = ranked(Tfidf.searchBm25Served(idx, qsNoSeed, "query_id", "qtext",
      k = 5, wandPrune = false))
    assert(a == b2 && a.size == 3)
    graft.operators.Caches.unpersistAll()
  }

  test("saveBm25Index / loadBm25Index round-trip serves bit-identically") {
    val pfx = "bm25_rt_test"
    Seq("postings", "termstats", "corpusstats").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${pfx}_$t"))
    try {
      val built = Tfidf.buildBm25Index(corpus, "doc_id", "text")
      Tfidf.saveBm25Index(built, pfx, buckets = 4)
      val loaded = Tfidf.loadBm25Index(spark, pfx)
      val got = ranked(Tfidf.searchBm25Served(loaded, queries,
        "query_id", "qtext", k = 3))
      assert(got.nonEmpty && got == ranked(Tfidf.searchBm25Served(built,
        queries, "query_id", "qtext", k = 3)))
    } finally {
      Seq("postings", "termstats", "corpusstats").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${pfx}_$t"))
      graft.operators.Caches.unpersistAll()
    }
  }

  test("row-local postings == shuffle-built postings (the streaming shape)") {
    val rowLocal = Tfidf.postingsRowLocal(corpus, "doc_id", "text")
    val built = Tfidf.buildBm25Index(corpus, "doc_id", "text").postings
    def norm(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val got = norm(rowLocal)
    assert(got.nonEmpty && got == norm(built), got.mkString("\n"))
    // tf > 1 rows exist, so the within-row count is really counting
    assert(got.exists(_._3 > 1L))
  }
}
