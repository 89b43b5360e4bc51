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

  test("funnel then audit is one pipeline run: frames cache-hit, components memoizes") {
    try {
      val docs = flood(6)
      // 1) the funnel runs the whole pipeline (gate, window, pairs,
      //    components) and leaves the frames in the two cache scopes
      val f = CorpusReport.funnelWithNearDup(docs, "doc_id", "text", "lang",
        pairs, maxCandidatePairs = Some(1000000L), candidateVolume = estimator)
        .orderBy("stage_idx").collect()
      assert(f.length == 4)
      // 2) an equal-input audit must find the components memo BEFORE it
      //    builds anything (the pair plan canonicalizes equal)...
      val frames2 = CorpusReport.curationFrames(
        docs, "doc_id", "text", "lang", pairs)
      assert(Caches.memoHit("corpus", frames2.pairs),
        "equal-plan pairs did not hit the components memo")
      // ...and the memo returns the SAME result instance on every equal
      // caller — the label-propagation loop cannot have re-run
      assert(frames2.comps eq CorpusReport.curationFrames(
        docs, "doc_id", "text", "lang", pairs).comps)
      // 3) the audit's executed plan reads the funnel's cached frames
      //    (gate verdicts + fingerprint window), not fresh scans
      val audit = CorpusReport.dropAudit(docs, "doc_id", "text", "lang", pairs)
      val drops = audit.collect()
      val p = audit.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), p)
      // 4) shared-run audit output equals the funnel's stage algebra:
      //    the 6-doc flood keeps 1 canonical, drops 5 as near-dups
      assert(drops.length == 5 && drops.forall(_.getString(2) == "neardup"),
        drops.mkString(";"))
    } finally releaseAll()
  }

  test("Dedup's internal cleanup cannot evict a held comps; corpus release does") {
    try {
      val docs = flood(6)
      val frames = CorpusReport.curationFrames(
        docs, "doc_id", "text", "lang", pairs)
      val before = frames.comps.collect().toSet
      assert(Caches.memoHit("corpus", frames.pairs))
      // Dedup fires this INTERNALLY at the end of its instrumented
      // ingestion path — it must not free the localCheckpointed comps a
      // CorpusReport caller still holds (lineage is truncated, so a
      // freed block would make the next read unrecoverable, not slow)
      Dedup.unpersistIntermediates()
      assert(Caches.memoHit("corpus", frames.pairs),
        "Dedup's own scope release evicted CorpusReport's components memo")
      assert(frames.comps.collect().toSet == before,
        "held comps must stay readable after Dedup's internal cleanup")
      // the documented corpus release is what frees it
      Caches.unpersistScope("corpus")
      assert(!Caches.memoHit("corpus", frames.pairs),
        "unpersistScope(corpus) must evict the components memo")
    } finally releaseAll()
  }

  test("drop audit names every dropped doc, its stage, reason and canonical") {
    try {
      // 3 quality-passing distinct docs, one exact duplicate of doc 1
      // (normalization: case + whitespace), one near-dup flood pair, and
      // one gate violator (too few tokens)
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog and then it runs home u1", "en"),
        (2L, "the quick brown fox jumps over the lazy dog and then it runs home u2", "en"),
        (3L, "a completely different prose line with the usual and plain words here", "en"),
        (4L, "The  Quick Brown Fox jumps over the lazy dog and then it runs home u1", "en"),
        (5L, "tiny", "en")).toDF("doc_id", "text", "lang")
      val audit = CorpusReport.dropAudit(docs, "doc_id", "text", "lang", pairs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
      // doc 5 fails the gate; doc 4 normalizes onto doc 1; docs 1-2 are
      // the near-dup pair whose canonical is the lower id
      assert(audit(5L)._2 == "quality" && audit(5L)._3.contains("too_few_tokens")
        && audit(5L)._4 == -1L, audit)
      assert(audit(4L) == ((2L, "exact", "exact_duplicate", 1L)), audit)
      assert(audit(2L) == ((3L, "neardup", "near_duplicate", 1L)), audit)
      assert(audit.keySet == Set(2L, 4L, 5L), audit) // survivors absent
      // reconciliation: audit drops per stage == funnel stage-to-stage loss
      releaseAll()
      val f = CorpusReport.funnelWithNearDup(docs, "doc_id", "text", "lang",
        pairs).orderBy("stage_idx").collect().map(_.getLong(2))
      val dropsByStage = audit.values.groupBy(_._1).view.mapValues(_.size).toMap
      assert(dropsByStage == Map(
        1L -> (f(0) - f(1)).toInt, 2L -> (f(1) - f(2)).toInt,
        3L -> (f(2) - f(3)).toInt), s"$dropsByStage vs ${f.toSeq}")
    } finally releaseAll()
  }
}
