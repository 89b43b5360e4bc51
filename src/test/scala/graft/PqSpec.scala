package graft

import graft.operators.{Caches, Pq, Similarity}
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

/** Product quantization (Pq scaladoc): deterministic build, code shape,
  * reconstruction fidelity, and retrieval quality vs exact brute force. */
class PqSpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  override def afterAll(): Unit = {
    Caches.unpersistScope("pq")
    super.afterAll()
  }

  test("codebook: one entry per (subspace, surviving centroid), 8-dim slices") {
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    val rows = cb.collect()
    assert(rows.nonEmpty && rows.length <= 8 * 16)
    assert(rows.forall { r =>
      val j = r.getAs[Int]("j"); val cid = r.getAs[Int]("cid")
      j >= 0 && j < 8 && cid >= 1 && cid <= 16 &&
        r.getAs[Seq[Float]]("cvec").length == 8
    })
    // every subspace trains its own codebook
    assert(rows.map(_.getAs[Int]("j")).distinct.length == 8)
  }

  test("build is byte-reproducible under repartitioning (fixed-point updates)") {
    def cb(df: org.apache.spark.sql.DataFrame) =
      Pq.build(df, "vec_id", "embedding", m = 8, k = 16, dim = 64)
        .collect().map(r => (r.getAs[Int]("j"), r.getAs[Int]("cid"),
          r.getAs[Seq[Float]]("cvec"))).sortBy(t => (t._1, t._2))
    assert(cb(emb).sameElements(cb(emb.repartition(13))))
  }

  test("codes: 8 ids per vector, each a live centroid of its own subspace") {
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    val live = cb.collect().map(r => (r.getAs[Int]("j"), r.getAs[Int]("cid"))).toSet
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", m = 8, dim = 64)
      .collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      // getSeq, not getAs[Seq[...]]: Spark hands back a mutable ArraySeq,
      // which the immutable-Seq checkcast getAs would insert rejects
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length == 8, r.toString)
      cs.zipWithIndex.foreach { case (c, j) => assert(live.contains((j, c))) }
    }
  }

  test("reconstructions point the right way: mean self-cosine well above chance") {
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    val recon = Pq.reconstruct(
      Pq.encode(emb, cb, "vec_id", "embedding", m = 8, dim = 64), cb)
    val joined = emb.select(col("vec_id").as("vid"), col("embedding"))
      .join(recon, Seq("vid"))
      .select(avg(cosineSim(col("embedding"), col("rvec"))).as("m"))
      .head().getDouble(0)
    // 64-dim random directions have E[cos] ~ 0; a faithful 8x16 quantizer
    // should keep most of the direction
    assert(joined > 0.5, s"mean self-cosine $joined")
  }

  test("pq retrieval recovers a usable share of the exact top-5") {
    val q = col("query_id") % 20 === 0
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vid") % 20 === 0, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Pq.topK(emb, "vec_id", "embedding", q, k = 5,
        m = 8, numCentroids = 16, dim = 64)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    // deterministic on the pinned fixture (measures 0.296 at sf0.001 —
    // flat 8×16 PQ over 64 dims keeps ~30% of the exact top-5); floor set
    // below the measured value so fixture regenerations don't flake
    assert(recall >= 0.25, s"recall@5 $recall")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("pq_cosine"),
      r.getAs[Long]("rank"))).sortBy(t => (t._1, t._4)).toSeq

  test("ADC lookup scoring emits exactly the reconstruct-cosine twin's output") {
    // the fidelity claim behind the r13 ADC rewrite: per-subspace partial
    // sums regroup the SAME double products, so after the round-5 output
    // rounding the two paths are identical — scores, neighbors, ranks
    val q = col("query_id") % 20 === 0
    val adc = rows(Pq.topK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64))
    val rec = rows(Pq.topKReconstruct(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64))
    assert(adc == rec)
  }

  test("IVF-PQ: probe-ALL equals the flat PQ scan; pruning trades recall, not correctness") {
    val q = col("query_id") % 20 === 0
    val flat = rows(Pq.topK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64))
    // probing every coarse cell makes the candidate set exhaustive, so
    // the composition must reproduce the flat scan EXACTLY — the same
    // construction that puts the whole pipeline under the DuckDB oracle
    val all = rows(Pq.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 16))
    assert(all == flat)
    // the serving configuration scans ~nProbe/coarseK of the corpus and
    // keeps about half of what flat PQ finds on the near-uniform random
    // fixture (measures 0.496 at sf0.001 — real corpora cluster, random
    // ones don't, so cell pruning here is close to random truncation);
    // floor below the measured value so fixture regenerations don't flake
    val pruned = rows(Pq.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 4))
      .map(t => (t._1, t._2)).toSet
    val flatPairs = flat.map(t => (t._1, t._2)).toSet
    val recall = (pruned & flatPairs).size.toDouble / flatPairs.size
    assert(recall >= 0.4, s"recall-vs-flat-PQ $recall")
  }

  test("the bench's pre-built-index seam serves the same rows as the inline build") {
    // the graft.bench.annIndex branch of q_ann_ivfpq (Bench's ann_serve
    // phase) is the one path Verify never exercises — pin it here: the
    // index persisted through parquet tables and served by ivfPqServe
    // must emit EXACTLY the inline composition's rows. At sf0.001 every
    // vec_id < 500, so the fixed-query-set filter is the identity and
    // the two branches answer the same question.
    import org.apache.spark.sql.functions.col
    val (_, cents) = graft.operators.Ivf.build(emb, "vec_id", "embedding",
      k = 16, iters = 2)
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    cents.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ann_centroids")
    cb.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ann_codebook")
    graft.sources.Sinks.bucketedTableOn(
      Pq.servingCodes(emb, "vec_id", "embedding", cb, cents, m = 8, dim = 64),
      "graft_ann_codes", Seq("centroid_id"), 4)
    // the fixed query set lands in its own prebuilt table too (r15) —
    // mirroring Bench's prebuild exactly
    emb.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .filter(col("query_id") % 20 === 0 && col("query_id") < 500)
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ann_queries")
    spark.conf.set("graft.bench.annIndex", "1")
    try {
      val served = SparkEntry.queries("q_ann_ivfpq")(spark, sf0001).collect()
      val servedF = SparkEntry.queries("q_ann_filtered")(spark, sf0001).collect()
      spark.conf.unset("graft.bench.annIndex")
      val inline = SparkEntry.queries("q_ann_ivfpq")(spark, sf0001).collect()
      val inlineF = SparkEntry.queries("q_ann_filtered")(spark, sf0001).collect()
      assert(served.length == inline.length && served.length > 0)
      assert(served.map(_.toString).sameElements(inline.map(_.toString)))
      // the filtered serving branch rides the same seam
      assert(servedF.length == inlineF.length && servedF.length > 0)
      assert(servedF.map(_.toString).sameElements(inlineF.map(_.toString)))
    } finally {
      spark.conf.unset("graft.bench.annIndex")
      spark.sql("DROP TABLE IF EXISTS graft_ann_codes")
      spark.sql("DROP TABLE IF EXISTS graft_ann_centroids")
      spark.sql("DROP TABLE IF EXISTS graft_ann_codebook")
      spark.sql("DROP TABLE IF EXISTS graft_ann_queries")
    }
  }

  test("filtered serving: pre-filter keeps the quota where post-filter starves") {
    val q = col("query_id") % 20 === 0
    val preF = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5, m = 8,
      numCentroids = 16, dim = 64, coarseK = 16, nProbe = 16,
      candPred = Some(col("vid") % 3 === 0))
      .select("query_id", "neighbor_id", "rank").collect()
    // every returned candidate satisfies the predicate…
    assert(preF.nonEmpty && preF.forall(_.getAs[Long]("neighbor_id") % 3 == 0))
    // …and every query still fills its k = 5 quota (probe-ALL, and the
    // admitted set is ~a third of the corpus — far more than k)
    val perQuery = preF.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    assert(perQuery.values.forall(_ == 5), perQuery.toMap.toString)
    // POST-filtering the unfiltered top-5 keeps only the admitted
    // survivors of 5 already-chosen rows: a strict subset of the
    // pre-filtered ranking (the globally-best admitted rows are the
    // pre-filter ranking's prefix), and it starves somewhere
    val unfiltered = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 16)
      .select("query_id", "neighbor_id").collect()
    val post = unfiltered.filter(_.getAs[Long]("neighbor_id") % 3 == 0)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pre = preF.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet
    assert(post.subsetOf(pre), (post -- pre).toString)
    assert(post.size < pre.size,
      s"post-filter kept ${post.size} of ${pre.size} — expected starvation " +
        "on a ~1/3-selective predicate")
  }

  test("index append: frozen-codebook batch encode ∪ old codes == one-shot full encode") {
    // the q_ann_index_append composition's load-bearing identity:
    // servingCodes is PER-ROW against literal codebooks, so encoding the
    // old corpus and a new batch separately (the rolling-ingest path)
    // yields byte-identical rows to encoding everything at once — no
    // rebuild, no drift, appending is one pass over the batch
    import graft.operators.Ivf
    val old = emb.filter(col("vec_id") % 10 =!= 9)
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val (_, cents) = Ivf.build(old, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.build(old, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toSeq, r.getInt(2))).sortBy(_._1).toSeq
    val appended = rowsOf(
      Pq.servingCodes(old, "vec_id", "embedding", cb, cents, m = 8, dim = 64)
        .unionByName(Pq.servingCodes(batch, "vec_id", "embedding", cb, cents,
          m = 8, dim = 64)))
    val oneShot = rowsOf(
      Pq.servingCodes(emb, "vec_id", "embedding", cb, cents, m = 8, dim = 64))
    assert(appended == oneShot)
    assert(appended.map(_._1).toSet ==
      emb.select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("index delete: tombstone-excluded serve == never-indexed serve; compaction drops the join") {
    // the q_ann_index_delete composition's load-bearing identities:
    // exclusion is per-row, so (1) serving the anti-joined frame is
    // byte-identical to serving a codes table that never contained the
    // deleted rows, and (2) compacting (materializing the anti-join
    // once) changes the PLAN — no tombstone join left — but never the
    // rows; deleted ids can never surface
    import graft.operators.Ivf
    val (_, cents) = Ivf.build(emb, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
    val codes = Pq.servingCodes(emb, "vec_id", "embedding", cb, cents,
      m = 8, dim = 64)
    val tombs = emb.select(col("vec_id")).filter(col("vec_id") % 7 === 0)
    val queries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qvec")).filter(col("query_id") % 20 === 0)
    def serve(c: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqServe(c, cents, cb, queries, k = 5, m = 8, numCentroids = 16,
        dim = 64, nProbe = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val excluded = serve(Pq.excludeTombstones(codes, tombs, "vec_id"))
    val neverIndexed = serve(codes.filter(col("vid") % 7 =!= 0))
    val got = rows(excluded)
    assert(got.nonEmpty && got == rows(neverIndexed))
    // deleted ids never surface
    assert(excluded.filter(col("neighbor_id") % 7 === 0).isEmpty)
    // the tombstone probe broadcasts (no corpus-side shuffle for it) …
    val pDel = excluded.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(pDel).isDefined, pDel)
    // … and COMPACTION removes it outright: one materialized anti-join
    // pass, after which the serve plan carries no anti-join at all
    val dir = java.nio.file.Files.createTempDirectory("pqcompact").toString
    Pq.excludeTombstones(codes, tombs, "vec_id")
      .write.mode("overwrite").parquet(dir)
    val compactServe = serve(spark.read.parquet(dir))
    val pCompact = compactServe.queryExecution.executedPlan.toString
    assert(!pCompact.contains("LeftAnti"), pCompact)
    assert(rows(compactServe) == got)
  }

  test("OPQ permutation: bijective, serpentine-balanced, cosine-invariant") {
    import spark.implicits._
    val perm = Pq.balancedPermutation(emb, "vec_id", "embedding",
      m = 8, dim = 64)
    // an orthogonal transform: every source dim lands exactly once
    assert(perm.sorted == (0 until 64))
    // serpentine allocation: each subspace receives one dim per energy
    // tier, so subspace energies balance — re-derive tier membership
    // from the permutation and check each subspace drew from all 8 tiers
    val row = emb.agg(
      (0 until 64).map(i => sum(floor(element_at(col("embedding"), i + 1)
        .cast("double") * element_at(col("embedding"), i + 1).cast("double")
        * 1048576.0).cast("long")).as(s"e$i")).head,
      (0 until 64).map(i => sum(floor(element_at(col("embedding"), i + 1)
        .cast("double") * element_at(col("embedding"), i + 1).cast("double")
        * 1048576.0).cast("long")).as(s"e$i")).tail: _*).collect().head
    val rankOf = (0 until 64).map(i => (row.getLong(i), i))
      .sortBy { case (e, i) => (-e, i) }.map(_._2).zipWithIndex.toMap
    (0 until 8).foreach { sub =>
      val tiers = (0 until 8).map(b => rankOf(perm(sub * 8 + b)) / 8)
      assert(tiers.sorted == (0 until 8), s"subspace $sub tiers $tiers")
    }
    // cosine is permutation-invariant as REAL arithmetic; the float fold
    // visits elements in permuted order, so the computed value may move
    // in its last ulp — which is why the oracle replays the PERMUTED
    // chain rather than assuming bit-equality with the unrotated one.
    // Assert the mathematical invariance at far-below-rounding tolerance.
    val permuted = Pq.permuteVecs(emb, "vec_id", "embedding", perm)
    def cos(df: org.apache.spark.sql.DataFrame) = df.limit(20)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2)
    val o = cos(emb); val p = cos(permuted)
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    (0 until o.length - 1).foreach { i =>
      val (d0, d1) = (dot(o(i), o(i + 1)), dot(p(i), p(i + 1)))
      assert(math.abs(d0 - d1) <= 1e-12 * math.max(1.0, math.abs(d0)),
        s"$d0 vs $d1")
    }
    // and the rotated serve returns a full quota of well-formed rows
    val got = Pq.ivfPqTopKOpq(emb, "vec_id", "embedding",
      col("query_id") % 20 === 0, k = 5, m = 8, numCentroids = 16,
      dim = 64, coarseK = 16, nProbe = 4).collect()
    assert(got.nonEmpty && got.groupBy(_.getLong(0)).values
      .forall(_.length == 5))
  }

  test("saveServingIndex / loadServingIndex round-trip serves bit-identically") {
    import graft.operators.Ivf
    val pfx = "ann_rt_test"
    Seq("codes", "centroids", "codebook").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${pfx}_$t"))
    try {
      val (_, cents) = Ivf.build(emb, "vec_id", "embedding", k = 16, iters = 2)
      val cb = Pq.build(emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      val codes = Pq.servingCodes(emb, "vec_id", "embedding", cb, cents,
        m = 8, dim = 64)
      Pq.saveServingIndex(codes, cents, cb, pfx, buckets = 4)
      val (lc, lcent, lcb) = Pq.loadServingIndex(spark, pfx)
      val queries = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec")).filter(col("query_id") % 20 === 0)
      def serve(c: org.apache.spark.sql.DataFrame,
                ce: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =
        Pq.ivfPqServe(c, ce, b, queries, k = 5, m = 8, numCentroids = 16,
          dim = 64, nProbe = 4).collect().map(_.toString).sorted.toSeq
      val got = serve(lc, lcent, lcb)
      assert(got.nonEmpty && got == serve(codes, cents, cb))
    } finally {
      Seq("codes", "centroids", "codebook").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${pfx}_$t"))
      Caches.unpersistScope("pq")
      Caches.unpersistScope("ivf")
    }
  }

  test("rerank with an exhaustive shortlist IS brute force; serving config lifts recall") {
    val q = col("query_id") % 20 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bruteForceTopK's predicate sees the pre-rename (vid, vec) frame
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vid") % 20 === 0, k = 5)
    // probe-ALL + a shortlist wider than the corpus → the refinement
    // scores every candidate exactly: output must BE brute force (rows,
    // scores, ranks — same rounding, same tie order)
    val exhaustive = Pq.ivfPqTopKRerank(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 16,
      shortlistFactor = 1000)
    def full(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank").collect()
        .map(_.toString).sorted.toSeq
    assert(full(exhaustive) == full(bf))
    // at the serving config (nProbe=4, shortlist 4k) the exact
    // refinement recovers brute-force neighbors the raw ADC ranking
    // misplaces: recall@5 must not drop, and measurably rises on this
    // fixture (quantization error re-ranked away)
    val bfPairs = pairs(bf)
    def recall(df: org.apache.spark.sql.DataFrame) =
      (pairs(df) & bfPairs).size.toDouble / bfPairs.size
    val adc = recall(Pq.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 4))
    val rr = recall(Pq.ivfPqTopKRerank(emb, "vec_id", "embedding", q, k = 5,
      m = 8, numCentroids = 16, dim = 64, coarseK = 16, nProbe = 4,
      shortlistFactor = 4))
    assert(rr >= adc, s"rerank recall $rr fell below ADC recall $adc")
  }
}
