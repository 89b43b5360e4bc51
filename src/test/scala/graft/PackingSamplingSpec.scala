package graft

import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Training-data pipeline ops: deterministic sampling/splits and sequence
  * packing. */
class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map(i => (i.toLong, 1L + rnd.nextInt(300).toLong))
      .toDF("doc_id", "n_tokens")
  }

  test("hash split is stable under repartitioning and roughly proportioned") {
    val d = docs(2000, 1)
    val s1 = Sampling.split(d, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val s2 = Sampling.split(d.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(s1 == s2) // membership does not depend on layout
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("val") - 0.10) < 0.03)
    assert(math.abs(frac("test") - 0.10) < 0.03)
    assert(math.abs(frac("train") - 0.80) < 0.05)
  }

  test("split leakage flags exactly the cross-split near-dup pairs, scores carried") {
    import org.apache.spark.sql.functions.col
    // enough docs that every split is populated, then near-dup pairs
    // planted WITHIN and ACROSS splits — only the cross ones may surface
    val ids = (0L until 500L)
    val splits = Sampling.split(ids.toDF("doc_id"), "doc_id")
    val byDoc = splits.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySplit = byDoc.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    val (tr, te, va) =
      (bySplit("train"), bySplit("test"), bySplit("val"))
    val pairs = Seq(
      (tr(0), tr(1), 0.91), // within train — must NOT surface
      (te(0), te(1), 0.92), // within test — must NOT surface
      (tr(2), te(2), 0.93), // train/test — leakage
      (va(0), tr(3), 0.94)) // val/train — leakage
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Sampling.splitLeakage(pairs, splits)
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(got == Set(
      (tr(2), te(2), "train", "test", 0.93),
      (va(0), tr(3), "val", "train", 0.94)), got)
  }

  test("split leakage SURFACES pairs whose endpoints the split frame does not cover") {
    import org.apache.spark.sql.functions.col
    // an audit must not silently under-report: a pair endpoint missing
    // from the assignment frame (split computed over a filtered corpus,
    // pairs over the full one) comes back with a null split, not dropped
    val splits = Sampling.split((0L until 100L).toDF("doc_id"), "doc_id")
    val pairs = Seq(
      (5L, 9999L, 0.91),    // b uncovered — must surface with null
      (8888L, 7777L, 0.92)) // both uncovered — must surface
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Sampling.splitLeakage(pairs, splits)
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    val aSplit = splits.filter(col("doc_id") === 5L)
      .collect().head.getString(1)
    assert(got == Set(
      (5L, 9999L, Some(aSplit), None),
      (8888L, 7777L, None, None)), got)
  }

  test("stratified sample keeps rate-0 strata empty and full-rate strata whole") {
    val d = docs(300, 2).withColumn("lang",
      when(col("doc_id") % 3 === 0, "en").when(col("doc_id") % 3 === 1, "zh")
        .otherwise("de"))
    val kept = Sampling.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 5000, "zh" -> 10000)).collect()
    val byLang = kept.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("de", 0) == 0)  // absent stratum dropped
    assert(byLang("zh") == 100)             // rate 10000 = keep all
    assert(byLang("en") > 20 && byLang("en") < 80) // ~50%
  }

  test("greedy packing never exceeds the budget; chunked matches its oracle shape") {
    val d = docs(500, 3)
    val g = Packing.greedy(d, "doc_id", "n_tokens", seqLen = 512, shards = 4)
    val packTotals = g.groupBy("pack_id").agg(
      sum("n_tokens").as("total"), count(lit(1)).as("n"), max("n_tokens").as("mx"))
      .collect()
    // a pack exceeds the budget only when it is a single oversized doc
    assert(packTotals.forall(r =>
      r.getAs[Long]("total") <= 512 || r.getAs[Long]("n") == 1L))
    // every doc is packed exactly once
    assert(g.count() == 500 && g.select("doc_id").distinct().count() == 500)
    // determinism
    val g2 = Packing.greedy(d.repartition(11), "doc_id", "n_tokens", 512, 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    val g1 = g.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    assert(g1 == g2)

    val c = Packing.chunked(d, "doc_id", "n_tokens", seqLen = 512, shards = 4)
    // same shard layout; chunked packs are contiguous in doc order
    assert(c.count() == 500)
    val perShard = c.groupBy("shard").agg(countDistinct("pack_id")).collect()
    assert(perShard.length == 4)
  }

  test("sliding chunks tile every token exactly under the stride contract") {
    val d = docs(300, 5)
    val c = Packing.slidingChunks(d, "doc_id", "n_tokens", seqLen = 64, stride = 32)
      .collect()
    val byDoc = c.groupBy(_.getAs[Long]("doc_id"))
    val lens = docs(300, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, rows) =>
      val n = lens(id)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      // starts are 0, 32, 64, ... and strictly below the token count
      assert(sorted.zipWithIndex.forall { case (r, i) =>
        r.getAs[Long]("start_tok") == 32L * i && r.getAs[Long]("start_tok") < n })
      // last chunk reaches exactly the end of the doc; none overruns
      assert(sorted.forall(r =>
        r.getAs[Long]("start_tok") + r.getAs[Long]("n_in_chunk") <= n))
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_in_chunk") == n)
    }
    // every doc with tokens produced at least one chunk
    assert(byDoc.keySet == lens.filter(_._2 > 0).keySet)
    // the fan-out is in-row: no exchange anywhere in the plan
    val plan = Packing.slidingChunks(d, "doc_id", "n_tokens", 64, 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("global shuffle is a reproducible permutation and layout-invariant") {
    val d = docs(1000, 6).select("doc_id")
    val s1 = Sampling.globalShuffle(d, "doc_id", shards = 8, seed = 7).collect()
    // every doc appears once; positions are 1..n_shard within each shard
    assert(s1.length == 1000 && s1.map(_.getLong(0)).distinct.length == 1000)
    s1.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // same seed → same order, regardless of input layout
    def order(df: org.apache.spark.sql.DataFrame, seed: Int) =
      Sampling.globalShuffle(df, "doc_id", 8, seed)
        .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(order(d, 7) == order(d.repartition(13), 7))
    // different seed → a different epoch order
    assert(order(d, 7) != order(d, 8))
    // and the order is not the identity (it actually shuffles)
    assert(order(d, 7) != (0L until 1000L).toSeq)
  }

  test("familiarity: hapax-dense docs score low, stereotyped docs high") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "qzxv wkpj mnbt rlsd yhgf"), // all hapax
      (4L, "the the the the")).toDF("doc_id", "text")
    val f = graft.operators.Familiarity.tokenFamiliarity(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(3L).getAs[Long]("n_hapax") == 5L)
    assert(f(3L).getAs[Double]("avg_token_freq") == 1.0)
    // 'the' appears 8 times corpus-wide → doc 4 averages exactly 8
    assert(f(4L).getAs[Double]("avg_token_freq") == 8.0)
    assert(f(1L).getAs[Double]("avg_token_freq") >
      f(3L).getAs[Double]("avg_token_freq"))
    assert(f(1L).getAs[Long]("n_tokens") == 6L)
  }

  test("greedy pack count sits between the token lower bound and 2x") {
    val d = docs(400, 4)
    val nGreedy = Packing.greedy(d, "doc_id", "n_tokens", 512, 4)
      .select("pack_id").distinct().count()
    // chunked ignores fit (docs straddle boundaries), so its count is the
    // ceil(total/512) lower bound that honest packing cannot beat...
    val nChunked = Packing.chunked(d, "doc_id", "n_tokens", 512, 4)
      .select("pack_id").distinct().count()
    assert(nGreedy >= nChunked)
    // ...and in-order first-fit wastes at most half each closed pack:
    // a closed pack plus the item that closed it exceeds the budget
    assert(nGreedy <= 2 * nChunked + 4) // +1 per shard tail
  }

  test("mixture sample upweights rare sources, caps at keep-all, stable under layout") {
    // 900 web / 90 books / 10 code → sqrt weights 30 : 9.49 : 3.16
    val d = (0 until 1000).map(i =>
        (i.toLong, if (i < 900) "web" else if (i < 990) "books" else "code"))
      .toDF("doc_id", "source")
    val kept = Sampling.mixtureSample(d, "doc_id", "source", targetRows = 300L)
      .collect()
    val bySrc = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    // code's proportional share (300·0.074 ≈ 22) exceeds its 10 rows → rate
    // caps at 1 and the whole source is kept
    assert(bySrc("code") == 10)
    // books: rate ≈ 300·0.222/90 ≈ 0.74 → well above its raw 9% share
    assert(bySrc("books") > 45 && bySrc("books") < 90)
    // web: rate ≈ 300·0.703/900 ≈ 0.23 — downweighted from its 90% share
    assert(bySrc("web") > 150 && bySrc("web") < 280)
    // membership is a content-hash rule: repartitioning changes nothing
    val kept2 = Sampling.mixtureSample(d.repartition(7), "doc_id", "source", 300L)
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_.getLong(0)).toSet == kept2)
  }

  test("dsir select ranks target-like docs first, scores match the fixed-point formula") {
    // target corpus: "alpha beta" style grams; raw: 3 target-like docs,
    // 3 alien docs. Bucket collisions are irrelevant to the independent
    // recompute below (it hashes the same way).
    val target = Seq("alpha beta gamma delta", "alpha beta gamma", "beta gamma delta")
      .toDF("text")
    val raw = Seq(
      (1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"),
      (3L, "alpha beta"), (4L, "zig zag zoom"),
      (5L, "quux corge grault"), (6L, "wib wob web"))
      .toDF("doc_id", "text")
    val buckets = 64
    val got = Sampling.dsirSelect(raw, target, "doc_id", "text",
      n = 6, buckets = buckets, gramN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // independent recompute: same md5 bucketing via MessageDigest, same
    // smoothed fixed-point ratio, same integer mean
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(g: String) = java.lang.Long.parseLong(md5hex(g).take(8), 16) % buckets
    def grams(t: String) = {
      val toks = t.toLowerCase.trim.split("\\s+").toSeq
      if (toks.length <= 1) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val rawDocs = Map(1L -> "alpha beta gamma delta", 2L -> "beta gamma delta epsilon",
      3L -> "alpha beta", 4L -> "zig zag zoom", 5L -> "quux corge grault",
      6L -> "wib wob web")
    val tCnt = target.collect().map(_.getString(0)).flatMap(grams)
      .groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val rAll = rawDocs.values.flatMap(grams).toSeq
    val rCnt = rAll.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val (tTot, rTot) = (tCnt.values.sum, rAll.size.toLong)
    def affinity(b: Long): Long =
      math.floor((tCnt.getOrElse(b, 0L) + 1L).toDouble * (rTot + buckets).toDouble
        / ((rCnt(b) + 1L).toDouble * (tTot + buckets).toDouble) * 1048576.0).toLong
    val expected = rawDocs.map { case (id, t) =>
      val gs = grams(t)
      val s = gs.map(g => affinity(bucket(g))).sum
      (id, gs.size.toLong, s / gs.size)
    }.toSeq.sortBy { case (id, _, sc) => (-sc, id) }
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")
    // the target-like docs outrank every alien doc
    val rank = got.map(_._1).toSeq
    assert(Set(1L, 2L, 3L).subsetOf(rank.take(3).toSet), rank.toString)
  }
}
