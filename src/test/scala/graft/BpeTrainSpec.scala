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
