package graft

import graft.plans.{NfcNormalize, TokenWindowHash64}
import org.apache.spark.sql.functions._

/** Unit behavior of the round-4 native expressions (end-to-end value
  * checks live in DedupSpec/TfidfFeatureSpec and the oracle). */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("token window hash: count, short-doc modes, order sensitivity") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),            // shorter than w=3
      (3L, Seq("b", "a", "c", "d")))  // doc 1 permuted
      .toDF("id", "toks")
      .select(col("id"),
        TokenWindowHash64.tokenWindowHash(col("toks"), 3).as("whs"),
        TokenWindowHash64.tokenWindowHash(col("toks"), 3, wholeTextIfShort = true)
          .as("whs_deg"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    // 4 tokens, w=3 → 2 windows; both modes agree for long docs
    assert(rows(1L)._1.length == 2 && rows(1L)._1 == rows(1L)._2)
    // short doc: empty by default, ONE whole-text hash in degenerate mode
    assert(rows(2L)._1.isEmpty && rows(2L)._2.length == 1)
    // window hashing is order-sensitive (chained, not a bag)
    assert(rows(1L)._1.toSet.intersect(rows(3L)._1.toSet).isEmpty)
    // shared suffix window ("b","c","d") vs ("a","c","d") differ too,
    // but the identical prefix tokens hash identically per token — the
    // per-window chain makes the whole window the unit of equality
  }

  test("nfc normalize: composes decomposed sequences, identity on ASCII") {
    val composed = "caf\u00e9"
    val decomposed = "café"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), NfcNormalize.nfc(col("s")).as("n"),
        length(NfcNormalize.nfc(col("s"))).as("len"))
    val rows = df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(rows(1L) == ((composed, 4)))   // 5 chars -> 4 after composition
    assert(rows(2L) == ((composed, 4)))
    assert(rows(3L)._1 == "plain ascii")
  }
}
