package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** [[BpeTrain.train]] — learning the merge table from a corpus. The
  * load-bearing properties: the learned ranks match a hand-computed
  * classic-BPE run (overlapping pair counts, (count DESC, lhs, rhs)
  * tie-break, left-to-right non-overlapping application), the table is
  * well-formed under [[graft.functions.Bpe.validate]] and round-trips
  * through the SHIPPED encoder ([[graft.plans.BpeTokens]] — the same
  * expression training itself uses per round), and pair exhaustion stops
  * early instead of looping or throwing. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learned merges match the hand-computed classic-BPE run") {
    // words: aaab ×2, aab ×1.
    // round 1: pairs (a,a):5 (overlapping — aaab counts it twice per
    //   occurrence), (a,b):3 → merge (a,a).
    // round 2: aaab → [aa,a,b] (left-to-right, non-overlapping),
    //   aab → [aa,b]; pairs (aa,a):2, (a,b):2, (aa,b):1 — count tie
    //   broken lexicographically: "a" < "aa" → merge (a,b).
    // round 3: aaab → [aa,ab], aab → [aa,b]; pairs (aa,ab):2,
    //   (aa,b):1 → merge (aa,ab).
    val docs = Seq("aaab aaab aab").toDF("text")
    val got = BpeTrain.train(docs, "text", numMerges = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "a", "a"), (2L, "a", "b"),
      (3L, "aa", "ab")), got.toSeq)
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("learned table is well-formed and round-trips through the shipped encoder") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "that cat, that hat!", "rates of cats and hats").toDF("text")
    val learned = BpeTrain.train(docs, "text", numMerges = 8)
    val merges = BpeTrain.merges(learned)
    assert(merges.length === 8)
    // well-formed: every composite introduced before use, introduced once
    graft.functions.Bpe.validate(merges)
    // round-trip: tokenizing planted text with the LEARNED table via the
    // shipped encoder reassembles the original pre-token text, and the
    // top merge ('t','h' or similar) provably compresses: fewer symbols
    // than code points
    val probe = Seq("the cat sat, that hat").toDF("text")
      .select(col("text"),
        graft.plans.BpeTokenCount.tokens(col("text"), merges).as("toks"),
        graft.plans.BpeTokenCount.count(col("text"), merges).as("n"))
      .collect()(0)
    val toks = probe.getSeq[String](1)
    assert(toks.mkString("") === "thecatsat,thathat") // pre-token concat
    assert(probe.getLong(2) === toks.length.toLong)
    assert(toks.length < "thecatsat,thathat".length,
      s"no compression: $toks")
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("resumed training == one uninterrupted run (checkpoint/restart)") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "that cat, that hat!", "rates of cats and hats").toDF("text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val full = table(BpeTrain.train(docs, "text", 6))
    val first4 = BpeTrain.merges(BpeTrain.train(docs, "text", 4))
    val resumed = table(BpeTrain.train(docs, "text", 6, init = first4))
    assert(resumed === full, s"resumed=$resumed full=$full")
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("vocabulary: exact frequencies, reassembles the corpus mass") {
    val docs = Seq("aaab aaab aab").toDF("text")
    val merges = BpeTrain.merges(BpeTrain.train(docs, "text", 2))
    // after (a,a) and (a,b): aaab -> [aa, ab] ×2, aab -> [aa, b] ×1
    val vocab = BpeTrain.vocabulary(docs, "text", merges)
      .orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vocab === Seq(("aa", 3L), ("ab", 2L), ("b", 1L)), vocab)
    // conservation: Σ symbol_len × freq == total pre-token chars
    assert(vocab.map { case (s, n) => s.length * n }.sum === 11L)
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("pair exhaustion stops early with the merges found so far") {
    // one distinct word "ab": round 1 merges (a,b); round 2 has no
    // adjacent pairs left anywhere — train must return 1 row, not loop
    val docs = Seq("ab ab ab").toDF("text")
    val got = BpeTrain.train(docs, "text", numMerges = 5)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "a", "b")), got.toSeq)
    graft.operators.Caches.unpersistScope("bpe")
  }

  // ---- trainFast (r15): the driver-side incremental trainer must equal
  // the distributed one EXACTLY — same adjacency counts, tie-breaks, and
  // merge application — or its shared oracle is a lie.

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("trainFast == train: hand corpus, run-chaining corpus, and a random one (delta == full recount)") {
    // the hand corpus (exact expected table, same as the train test)
    val hand = Seq("aaab aaab aab").toDF("text")
    assert(table(BpeTrain.trainFast(hand, "text", 3)) ===
      Seq((1L, "a", "a"), (2L, "a", "b"), (3L, "aa", "ab")))
    // run-chaining stress: long same-symbol runs exercise the
    // left-to-right non-overlapping pass and the overlapping adjacency
    // counts ("aaaa" counts (a,a) three times, merges to [aa,aa])
    val runs = Seq("aaaa aaa aaaaa bbbb abab baba",
      "aaab bbba abba baab aaaa").toDF("text")
    assert(table(BpeTrain.trainFast(runs, "text", 8)) ===
      table(BpeTrain.train(runs, "text", 8)))
    // seeded pseudo-random corpus over a tiny alphabet: deep merges where
    // composites merge with composites, many exact count ties
    val rnd = new scala.util.Random(42)
    val docs = (1 to 60).map { _ =>
      (1 to 12).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => "abcd" (rnd.nextInt(4))).mkString)
        .mkString(" ")
    }.toDF("text")
    assert(table(BpeTrain.trainFast(docs, "text", 24)) ===
      table(BpeTrain.train(docs, "text", 24)))
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("trainFast: resume == uninterrupted, exhaustion stops early, guards fail by name") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "that cat, that hat!", "rates of cats and hats").toDF("text")
    val full = table(BpeTrain.trainFast(docs, "text", 6))
    assert(full === table(BpeTrain.train(docs, "text", 6)))
    val first4 = BpeTrain.merges(BpeTrain.trainFast(docs, "text", 4))
    assert(table(BpeTrain.trainFast(docs, "text", 6, init = first4)) === full)
    // exhaustion: one distinct word "ab" → exactly one merge, no loop
    assert(table(BpeTrain.trainFast(Seq("ab ab ab").toDF("text"), "text", 5))
      === Seq((1L, "a", "b")))
    // the bounded-collect cap fails by name, not by driver OOM
    val ex = intercept[IllegalArgumentException] {
      BpeTrain.trainFast(docs, "text", 2, maxWords = 3)
    }
    assert(ex.getMessage.contains("maxWords"), ex.getMessage)
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("trainFast minCount: the df-cap trains as if rare words were absent") {
    // 'zq' is a hapax — with minCount=2 the capped run must equal
    // training on the corpus with the hapax removed (the documented
    // semantics change: rare words stop influencing the table)
    val withHapax = Seq("the cat sat zq", "the cat sat", "the hat").toDF("text")
    val without = Seq("the cat sat", "the cat sat", "the hat").toDF("text")
    // NOTE: word FREQUENCIES differ between the two corpora ('the cat
    // sat' appears once vs twice) — so compare against the df-capped
    // table computed the slow way instead: train on withHapax restricted
    // by hand is not expressible; assert instead that (a) minCount=1
    // equals train exactly and (b) minCount=2 learns no merge involving
    // a symbol only 'zq' provides
    assert(table(BpeTrain.trainFast(withHapax, "text", 4)) ===
      table(BpeTrain.train(withHapax, "text", 4)))
    val capped = BpeTrain.merges(
      BpeTrain.trainFast(withHapax, "text", 4, minCount = 2L))
    assert(capped.nonEmpty)
    assert(!capped.exists { case (l, r) =>
      (l + r).contains("z") || (l + r).contains("q") },
      s"hapax-only symbols leaked into the df-capped table: $capped")
    graft.operators.Caches.unpersistScope("bpe")
    // `without` kept for reading symmetry — df-capping withHapax at 2
    // drops exactly the zq row from the WORD table, not doc rows
    assert(without.count() == 3)
  }

  test("writeArtifact round-trips through loadMerges and carries the encoder's id scheme") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "that cat, that hat!", "rates of cats and hats").toDF("text")
    val learned = BpeTrain.merges(BpeTrain.trainFast(docs, "text", 8))
    val dir = java.nio.file.Files.createTempDirectory("bpe_artifact").toString
    try {
      BpeTrain.writeArtifact(learned, dir)
      // merges.txt parses, re-validates, and reproduces the table
      val back = graft.functions.Bpe.loadMerges(s"$dir/merges.txt")
      assert(back === learned, s"round-trip drift: $back vs $learned")
      // vocab.json carries exactly the composite ids the encoder uses
      val json = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/vocab.json"))
      graft.functions.Bpe.vocabIds(learned).foreach { case (sym, id) =>
        assert(json.contains(s"\"$sym\": $id"), s"missing $sym -> $id in $json")
      }
      // no .tmp residue — both writes were atomic moves
      import scala.jdk.CollectionConverters._
      val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().asScala.map(_.getFileName.toString).filter(_.endsWith(".tmp"))
      assert(leftovers.isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    graft.operators.Caches.unpersistScope("bpe")
  }

  test("oracle replay SQL mirrors the engine on the hand corpus (DuckDB-shaped CTEs are generated, not hand-kept)") {
    // not a DuckDB run (the driver does that) — pin the generated SQL's
    // structural invariants so oracle edits can't silently drop a round
    // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    // w_i referencing w_{i-1} twice (directly + via b_i) makes the
    // inlined scan tree EXPONENTIAL in rounds — 16 rounds exhausted the
    // process fd limit before any row was produced
    val ctes = BpeTrain.oracleCtes("documents", "text", 4)
    (1 to 4).foreach { i =>
      assert(ctes.contains(s"p$i AS MATERIALIZED ("), s"missing pair CTE p$i")
      assert(ctes.contains(s"b$i AS MATERIALIZED ("), s"missing argmax CTE b$i")
      assert(ctes.contains(s"w$i AS MATERIALIZED ("), s"missing merged-vocab CTE w$i")
    }
    assert(ctes.contains("ORDER BY cnt DESC, lhs, rhs LIMIT 1"))
    val sel = BpeTrain.oracleSelect(4)
    assert(sel.contains("SELECT CAST(4 AS BIGINT) AS rnk, lhs, rhs FROM b4"))
  }
}
