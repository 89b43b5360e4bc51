package graft

import graft.operators.{Caches, CorpusReport, Dedup}
import org.apache.spark.sql.functions._

/** Funnel accounting + the candidate-volume pre-flight budget. */
class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  // Gate-passing prose (≥10 tokens, stopwords, alphabetic) with a unique
  // trailing token per doc, so normalization keeps every doc distinct
  // while all docs share their leading 5-gram shingles — the planted
  // near-dup FLOOD: every shared shingle's df equals the corpus size.
  private def flood(n: Int) = (1 to n).map(i =>
    (i.toLong,
      s"the quick brown fox jumps over the lazy dog and then it runs home u$i",
      "en")).toDF("doc_id", "text", "lang")

  private def pairs(uniq: org.apache.spark.sql.DataFrame) =
    Dedup.jaccardNearDups(uniq, "doc_id", "text",
      shingleN = 5, dfMax = 20, minJaccard = 0.5).select("doc_a", "doc_b")

  private val estimator = Some((uniq: org.apache.spark.sql.DataFrame) =>
    Dedup.candidateVolumeEstimate(uniq, "doc_id", "text",
      shingleN = 5, dfMax = 20))

  private def releaseAll(): Unit = {
    Caches.unpersistScope("corpus")
    Dedup.unpersistIntermediates()
  }

  test("pre-flight budget refuses a planted flood corpus before any pair materializes") {
    try {
      // 12 mutual near-dups: every shared shingle has df=12 (in the
      // [2, dfMax] band), so the index would enumerate ~shingles·C(12,2)
      // pairs — far over a budget of 10
      val e = intercept[IllegalStateException] {
        CorpusReport.funnelWithNearDup(flood(12), "doc_id", "text", "lang",
          pairs, maxCandidatePairs = Some(10L), candidateVolume = estimator)
      }
      assert(e.getMessage.contains("budget"), e.getMessage)
      // the refusal names the measured volume = the exact Σ df·(df−1)/2
      // the guard computed, so the caller can size a retry
      val est = Dedup.candidateVolumeEstimate(
        CorpusReport.exactUnique(flood(12), "doc_id", "text", "lang"),
        "doc_id", "text")
      assert(e.getMessage.contains(est.toString), s"$est vs ${e.getMessage}")
    } finally releaseAll()
  }

  test("a budget without an estimator is a named argument error, not a silent default") {
    intercept[IllegalArgumentException] {
      CorpusReport.funnelWithNearDup(flood(3), "doc_id", "text", "lang",
        pairs, maxCandidatePairs = Some(10L))
    }
  }

  test("a generous budget passes through and the funnel reports all four stages") {
    try {
      val rows = CorpusReport.funnelWithNearDup(flood(6), "doc_id", "text",
          "lang", pairs, maxCandidatePairs = Some(1000000L),
          candidateVolume = estimator)
        .orderBy("stage_idx").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getString(1)).toSeq ==
        Seq("ingest", "quality_kept", "exact_unique", "neardup_kept"))
      // the flood collapses to its canonical doc at the near-dup stage
      assert(rows(3).getLong(2) == 1L, rows.mkString(";"))
    } finally releaseAll()
  }
}
