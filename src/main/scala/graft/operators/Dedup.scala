package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline surface: exact,
  * normalized, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale notes (the 100 TB story):
  *  - exact/normalized dedup is a single hash aggregate on a fingerprint —
  *    one shuffle on the dedup key, map-side partial aggregation.
  *  - MinHash signatures never leave the row: the whole k-family signature
  *    is one native single-pass expression over the per-doc shingle-hash
  *    array ([[graft.plans.MinHashSig]]) — ZERO shuffles; only the banded
  *    candidate join moves data.
  *  - candidate generation joins on (band, bandHash) buckets; bucket size
  *    is capped ([[LshMaxBucket]]) so a degenerate hot bucket (all-equal
  *    docs) cannot go quadratic — the cap drops only buckets that exact
  *    dedup should have removed first anyway.
  *  - all pair outputs use `idA < idB` so each pair appears once.
  */
object Dedup {

  /** Persisted intermediates route through the shared [[Caches]] registry
    * under the "dedup" scope (see its scaladoc for the lazy-builder
    * rationale); [[unpersistIntermediates]] releases ONLY this operator
    * family's caches, never another owner's (Ivf, TextSources). */
  private def tracked(df: DataFrame): DataFrame = Caches.tracked(df, "dedup")
  def unpersistIntermediates(): Unit = Caches.unpersistScope("dedup")

  /** Exact duplicate groups by md5 fingerprint of `text`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Whitespace/case-insensitive duplicate groups. */
  def normalizedGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle-hash) pairs — the base table for MinHash and
    * Jaccard. Two scale choices:
    *  - tokens are materialized in their own projection first so the
    *    shingle lambda doesn't re-tokenize per shingle (see
    *    [[graft.functions.Text.shinglesFromTokens]]);
    *  - shingles are carried as 64-bit xxhash values, not strings — set
    *    identity is all dedup needs, and every downstream shuffle
    *    (distinct, df-count, inverted-index self-join) moves 8-byte longs
    *    instead of ~30-byte strings. Collision odds at 64 bits are
    *    negligible against corpus sizes this targets. */
  /** Distinct per-doc shingle hashes as (doc, shingle) rows. Hashes come
    * from the native one-pass [[graft.plans.TokenWindowHash64]] (no
    * shingle strings materialize, stays in codegen; whole-text degenerate
    * for docs shorter than n, matching
    * [[Text.shinglesFromTokens]]), and the per-doc set dedup happens
    * IN-ROW via `array_distinct` BEFORE the explode — so no corpus-wide
    * `.distinct()` shuffle exists: rows leave the map side already
    * set-unique. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"),
        explode(array_distinct(
          graft.plans.TokenWindowHash64.tokenWindowHash(col("toks"), n,
            wholeTextIfShort = true))).as("shingle"))

  /** MinHash signatures: k deterministic hash families via
    * `xxhash64(seed_i, shingle)`, the whole signature computed IN-ROW by
    * the native single-pass [[graft.plans.MinHashSig]] expression over the
    * per-doc shingle-hash array. Returns (doc, sig array<long>).
    *
    * ZERO shuffles: the form this replaced ([[minhashSignaturesShuffled]],
    * kept as the spec twin) exploded every 5-gram occurrence, ran a
    * corpus-wide `.distinct()`, then `groupBy(doc)` with k min-aggregates —
    * two full shuffles of the shingle stream that dominated the round-3
    * sf1 MinHash bench. A minimum is insensitive to duplicates, so the
    * in-row form needs no distinct at all; signatures are bit-equal
    * (proven in `DedupSpec`). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleN: Int = 5): DataFrame =
    docs.select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"),
        graft.plans.TokenWindowHash64.tokenWindowHash(col("toks"), shingleN,
          wholeTextIfShort = true).as("hs"))
      .select(col("doc"),
        graft.plans.MinHashSig.minhashSig(col("hs"), numHashes).as("sig"))

  /** Spec twin: the exploded-shingle groupBy formulation the in-row default
    * replaced — kept so `DedupSpec` can assert signature equality. Do NOT
    * use on large corpora: it shuffles every shingle occurrence twice. */
  private[graft] def minhashSignaturesShuffled(docs: DataFrame, idCol: String,
                                               textCol: String,
                                               numHashes: Int = 32,
                                               shingleN: Int = 5): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, shingleN)
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col("doc"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  val LshMaxBucket = 64

  /** Drop bucket rows whose bucket exceeds maxBucket members — the guard
    * every banded join below shares. Over-full buckets are where a bucket
    * join goes quadratic, and at these thresholds they can only be
    * near-exact duplicate floods that exact dedup should have removed
    * first.
    *
    * Shape: the OVERFLOW list is what's enforced, not the keep list — at
    * most N/maxBucket buckets can overflow, so `hot` is tiny and the
    * enforcement is a broadcast anti-join that never reshuffles the
    * banded side (the earlier inner-join-the-keep-list form dragged every
    * banded row through two extra exchanges). Singleton buckets pass
    * through: they produce no pairs in a self-join and must pair with the
    * other side in a cross-table join, so no floor is needed or applied.
    * The count aggregate is map-side combinable, and Exchange-free on a
    * store already bucketed by `keys`. */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String],
                                maxBucket: Int): DataFrame = {
    val hot = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(keys.map(col): _*)
    // No broadcast hint: hot is near-empty on sane corpora and AQE flips
    // the anti-join to broadcast at runtime, but a pathological all-flood
    // corpus can have N/maxBucket overflow buckets — too big to force.
    banded.join(hot, keys, "left_anti")
  }

  /** Shared banded-candidate stage for BOTH hash families (the `bh` and
    * `sig` element types may be xxhash64 longs or portable md5 strings —
    * the algebra is identical): cap (band, bh) buckets at
    * `2..maxBucket`, self-join within buckets, dedup (doc_a, doc_b)
    * pairs, rejoin signatures, and keep pairs whose estimated Jaccard
    * (matching-position fraction) is ≥ `minEstJaccard`.
    *
    * Shuffle discipline: the self-join and the `.distinct()` carry only
    * (band, bh, doc) rows; full signatures rejoin AFTER pair-dedup,
    * touching each surviving pair once. */
  private[graft] def bandedCandidates(banded: DataFrame, sigs: DataFrame,
                                      numHashes: Int,
                                      minEstJaccard: Double = 0.0,
                                      maxBucket: Int = LshMaxBucket): DataFrame = {
    // maxBucket = Int.MaxValue disables the cap — for the portable ORACLE
    // ANCHOR (whose DuckDB twin mirrors the raw algebra) and for callers
    // whose banded input was already capped upstream.
    val bucketed =
      if (maxBucket == Int.MaxValue) tracked(banded)
      else tracked(capBuckets(banded, Seq("band", "bh"), maxBucket))
    val pairs = bucketed.select(col("band"), col("bh"), col("doc").as("doc_a"))
      .join(bucketed.select(col("band"), col("bh"), col("doc").as("doc_b")),
        Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    pairs
      .join(sigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          p => p)).cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** LSH banding: split the signature into `bands` bands, hash each band,
    * and emit candidate pairs that share at least one band bucket.
    * Estimated Jaccard = fraction of equal signature components.
    *
    * Shuffle discipline at scale: the banded self-join and the candidate
    * `.distinct()` carry ONLY (band, bh, doc ids) — 24 bytes/row. The
    * 32-long signatures (~512 B each) rejoin AFTER pair-dedup, touching
    * each surviving pair once. The earlier form that dragged both
    * signatures through the distinct exchange measured ~24× cost at 10×
    * data (sf1 driver bench); this one is ~linear. */
  def minhashCandidates(sigs: DataFrame, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigsP = tracked(sigs)
    bandedCandidates(bandedXxhash(sigsP, numHashes, bands), sigsP, numHashes)
  }

  /** LSH banding of xxhash64 signatures: (doc, band, bh) — band b's bucket
    * key is xxhash64 over its `numHashes/bands` signature positions, seeded
    * by the band index. The scale-default twin of [[bandedPortable]]:
    * 8-byte BIGINT band keys instead of 32-char md5 strings in every
    * shuffle. */
  private[graft] def bandedXxhash(sig: DataFrame, numHashes: Int,
                                  bands: Int): DataFrame = {
    val rows = numHashes / bands
    sig.select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** Full MinHash near-dup pipeline: docs → signatures → banded candidates
    * with estimated Jaccard ≥ `minEstJaccard`. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 5,
                      minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes, shingleN)
    minhashCandidates(sigs, numHashes, bands)
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash over whitespace tokens: bit i of the signature is the
    * sign of Σ over token instances of (±1 by bit i of xxhash64(token)).
    *
    * Computed entirely inside the row — token hashes are materialized once
    * per document (projection boundary, see
    * [[graft.functions.Text.shinglesFromTokens]]), then 64 in-row
    * `aggregate` folds produce the bit signs. ZERO shuffles: the
    * explode + (doc,token) groupBy + 64-column aggregate formulation this
    * replaces shuffled every token of the corpus twice; this one touches
    * each document exactly once where it already lives. (Iterating token
    * instances is equivalent to weighting distinct tokens by their in-doc
    * count.) */
  /** DEFAULT simhash: one native single-pass vote ([[graft.plans.SimHash64]])
    * instead of 64 per-bit `aggregate` folds — identical signatures,
    * proven against [[simhashComposable]] in `DedupSpec`. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"), transform(col("toks"), t => xxhash64(t)).as("hashes"))
      .select(col("doc"), graft.plans.SimHash64.simhash64(col("hashes")).as("simhash"))

  /** Composable spec twin of [[simhash]]: per-bit array folds. */
  def simhashComposable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bits = (0 until 64).map { i =>
      val bitSum = aggregate(col("hashes"), lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    docs
      .select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"), transform(col("toks"), t => xxhash64(t)).as("hashes"))
      .select(col("doc"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dups within `maxHamming`: band the 64-bit signature into
    * 4×16-bit chunks — any pair with hamming ≤ 3 must agree on ≥1 chunk
    * (pigeonhole), so a chunk-equality join finds all of them without a
    * cross join. Chunk buckets are capped like every other banded join
    * here ([[capBuckets]]): a 16-bit chunk has only 65,536 values, so at
    * billions of docs uncapped buckets would go quadratic. */
  def simhashNearDups(sigs: DataFrame, maxHamming: Int = 3,
                      maxBucket: Int = LshMaxBucket): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val banded = sigs.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val chunked = tracked(capBuckets(banded, Seq("chunk", "chunk_val"), maxBucket))
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .drop("sh_a", "sh_b")
  }

  /** Signature half of [[simhashNearDupsPortable]]: the same vote algebra
    * as [[simhash]], but over an md5-derived hash family with the 64 bits
    * carried as 16 hex digits (4 bit-votes per nibble), so an independent
    * SQL engine can recompute every vote from its own md5. Hex-string
    * signatures sidestep signed-64-bit overflow portability entirely. */
  def simhashPortableSigs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"), transform(col("toks"), t => md5(t)).as("hs"))
    def nibOf(h: Column, j: Int) = conv(substring(h, j, 1), 16, 10).cast("int")
    val digits = (1 to 16).map { j =>
      val digit = (0 until 4).map { k =>
        val vote = aggregate(col("hs"), lit(0), (acc, h) =>
          acc + when(shiftright(nibOf(h, j), k).bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote > 0, lit(1 << k)).otherwise(lit(0))
      }.reduce(_ + _)
      lower(conv(digit.cast("string"), 10, 16))
    }
    base.select(col("doc"), concat(digits: _*).as("simhash_hex"))
  }

  /** Portable SimHash twin: signature → 4×4-hex-digit chunk banding →
    * exact hamming over nibbles, all expressible in portable SQL — the
    * same role [[minhashNearDupsPortable]] plays for MinHash: the WHOLE
    * algorithm sits under the oracle, while the xxhash64 [[simhash]] +
    * [[simhashNearDups]] remain the scale default (8-byte signatures,
    * capped buckets). Pair dedup is ids-only with signatures rejoined,
    * the narrow-shuffle shape shared by every banded join here. */
  def simhashNearDupsPortable(docs: DataFrame, idCol: String, textCol: String,
                              maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val sigs = tracked(simhashPortableSigs(docs, idCol, textCol))
    val banded = sigs.select(col("doc"),
        posexplode(array((0 until 4).map(c =>
          substring(col("simhash_hex"), c * 4 + 1, 4)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val pairs = banded.select(col("chunk"), col("chunk_val"), col("doc").as("doc_a"))
      .join(banded.select(col("chunk"), col("chunk_val"), col("doc").as("doc_b")),
        Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    def nib(c: Column, j: Int) = conv(substring(c, j, 1), 16, 10).cast("int")
    val hamming = (1 to 16).map(j =>
      bit_count(nib(col("hex_a"), j).bitwiseXOR(nib(col("hex_b"), j)))).reduce(_ + _)
    pairs
      .join(sigs.select(col("doc").as("doc_a"), col("simhash_hex").as("hex_a")), Seq("doc_a"))
      .join(sigs.select(col("doc").as("doc_b"), col("simhash_hex").as("hex_b")), Seq("doc_b"))
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Embedding-cosine near-dups, exact: all pairs with cosine ≥ threshold,
    * via the native [[graft.plans.CosineSimilarity]] expression on a
    * broadcast self-join. O(n²) BY DESIGN — this is the small-n oracle
    * baseline that [[embeddingNearDupsLsh]] is verified against; the LSH
    * form is the path for corpora that don't fit a broadcast. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, roundTo: Int = 5): DataFrame = {
    import graft.plans.CosineSimilarity.cosineSim
    val v = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val a = v.select(col("vid").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("vid").as("id_b"), col("vec").as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosineSim(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding-cosine near-dups at scale: candidates come from `tables`
    * independent SRP-LSH bucketings ([[graft.functions.Vectors.srpBucket]],
    * one seeded hyperplane family per table), every join is an equi-join on
    * (table, bucket) or on an id — the corpus is NEVER broadcast and NO
    * quadratic pair set is materialized:
    *
    *   1. each vector lands in one bucket per table (`tables` rows total);
    *   2. buckets are capped ([[capBuckets]]) so a hot bucket can't go
    *      quadratic;
    *   3. distinct candidate id pairs from bucket-local self-joins;
    *   4. vectors re-joined by id, cosine scored by the native codegen
    *      expression, threshold applied.
    *
    * Recall: a hyperplane separates a pair with probability angle/π, so a
    * pair at cosine ≥ t shares a table's bucket with p ≥ (1-acos(t)/π)^planes
    * and is found with 1-(1-p)^tables. Collinear pairs (scaled copies —
    * the dedup case) share buckets in EVERY table: recall 1 by
    * construction, which is why the planted-pair query can share the exact
    * path's oracle. */
  def embeddingNearDupsLsh(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, planes: Int = 10, tables: Int = 4,
                           roundTo: Int = 5, maxBucket: Int = LshMaxBucket): DataFrame = {
    import graft.functions.Vectors
    import graft.plans.CosineSimilarity.cosineSim
    val v = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val banded = v.select(col("vid"),
        posexplode(array((0 until tables).map(t =>
          Vectors.srpBucket(col("vec"), planes, seed = t + 1)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val bucketed = tracked(capBuckets(banded, Seq("tbl", "bucket"), maxBucket))
    val cand = bucketed.select(col("tbl"), col("bucket"), col("vid").as("id_a"))
      .join(bucketed.select(col("tbl"), col("bucket"), col("vid").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(v.select(col("vid").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(v.select(col("vid").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("cosine", round(cosineSim(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Connected components over a near-dup pair set (`doc_a`, `doc_b`) by
    * iterative min-label propagation: each round every node adopts the
    * minimum label in its neighborhood; converges in O(component diameter)
    * rounds. Each round is two equi-joins + an aggregate — all
    * shuffle-partitioned on the node id, no driver-side graph. The labels
    * frame is persisted per round and the loop exits on a driver-checked
    * convergence count (bounded by `maxIters`), which is the standard
    * Spark iterative-algorithm shape. The convergence probe runs only
    * every `probeEvery` rounds: each probe is a synchronous driver action,
    * and near-dup components are shallow (diameter 1-2 for pair-dominated
    * dedup graphs), so probing at round 2 usually catches convergence with
    * half the driver round-trips; the cost of batching is at most
    * `probeEvery - 1` no-op propagation rounds after the fixed point,
    * each an idempotent map of already-converged labels. Returns
    * (doc, component) where component = min doc id reachable. */
  /** Free a localCheckpointed frame's blocks promptly. They live OUTSIDE
    * the CacheManager, so `Dataset.unpersist` on such a frame is a no-op
    * (it only uncaches CacheManager entries) and the blocks would wait
    * for the ContextCleaner after GC — unpersist the checkpointed RDD
    * itself, reachable through the LogicalRDD the checkpoint rewrote the
    * plan to. Used by [[components]]' per-round frees and as the
    * [[Caches.memo]] release for memoized components results. */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => ()
    }

  def components(pairs: DataFrame, maxIters: Int = 20,
                 probeEvery: Int = 2): DataFrame = {
    require(maxIters >= 1, "components needs at least one round")
    require(probeEvery >= 1, "probeEvery must be >= 1")
    // Both directions PLUS a self-loop per endpoint, all from ONE pass
    // over the pair stream (explode, not self-union: the pair-generation
    // subtree is typically an expensive LSH plan, and a union of selects
    // would execute it twice). The self-loop buys two structural savings,
    // measured at ~40% of the operator's wall time on the ingestion
    // bench: (a) every round is a SINGLE join + aggregate — the node's
    // own label rides the self-loop row into the neighborhood minimum, so
    // the old form's second (left) join back to the previous labels
    // disappears, and with labels referenced once per round the
    // exponential-plan-growth hazard that motivated checkpoint-per-round
    // is gone too; (b) round 1 needs NO join at all — over identity
    // initial labels the neighborhood minimum is just min(dst) — so the
    // separate init-labels materialization job disappears.
    // No edge-stream distinct: min-aggregation is duplicate-insensitive,
    // every caller's pair stream is already pair-distinct (bandedCandidates
    // / jaccard / simhash all end in a pair dedup), and the only dups this
    // explode ADDS are one self-loop per pair endpoint — at most a 2×
    // inflation of the per-round join input, cheaper than the full
    // exchange a .distinct() would pay up front.
    // LAZY localCheckpoint, not persist (r19, guide §3.3 "planning time
    // itself can become the bottleneck"): the caller's pair plan is
    // typically an enormous LSH/self-join tree, and a persisted frame
    // KEEPS that logical plan — every round's join and every probe then
    // re-runs analysis + optimization over the full pair lineage even
    // though the CacheManager substitutes it physically. The r19 funnel
    // profile measured ~5.5 s of pure driver gaps between this loop's
    // jobs (16.2 s query). The checkpoint truncates the lineage to a
    // LogicalRDD once, so each round plans over a three-node tree; the
    // first probe materializes it (same I/O as the persist it replaces).
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")),
        struct(col("doc_a").as("src"), col("doc_a").as("dst")),
        struct(col("doc_b").as("src"), col("doc_b").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(false)
    // `old` = the node's label BEFORE the round (identity in round 1; the
    // self-loop row's looked-up label afterwards), so the convergence
    // probe is a filter over the materialized frame, not an extra join.
    // LAZY `localCheckpoint` pins each round's result as a
    // lineage-truncating materialized RDD (the standard Spark shape for
    // iterative graph algorithms — on a cluster with executor churn, swap
    // in reliable `checkpoint`) but, unlike the eager form, does NOT pay
    // a synchronous job per round: the probe every `probeEvery` rounds is
    // the action that materializes the rounds since the last probe in ONE
    // job. Frames between probes stay referenced (each round reads its
    // predecessor), so unpersists are deferred until the probe has
    // materialized the current frame.
    var labels = edges.groupBy(col("src").as("doc"))
      .agg(min(col("dst")).as("component"))
      .withColumn("old", col("doc"))
      .localCheckpoint(false)
    var pendingUnpersist: List[DataFrame] = Nil
    // No limit(1) shortcut: the probe's count is ALSO the action that
    // materializes the lazy checkpoints, and a limit would compute (and
    // checkpoint) only some partitions — later rounds would then
    // recompute the missing ones through predecessors the probe already
    // unpersisted, turning the lineage cut into a lineage re-run
    // (measured: 1.8 s regression on the components bench query).
    def probe(): Boolean = {
      val c = labels.filter(col("component") =!= col("old")).count() == 0
      pendingUnpersist.foreach(freeLocalCheckpoint)
      pendingUnpersist = Nil
      c
    }
    var iter = 1
    var converged = (iter % probeEvery == 0 || iter == maxIters) && probe()
    while (!converged && iter < maxIters) {
      // neighborhood minimum over previous labels: each edge looks up its
      // dst's label; the self-loop contributes the node's own, which both
      // feeds the min and rides out as `old`.
      val next = edges
        .join(labels.select(col("doc").as("dst"), col("component")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("component"),
          min(when(col("dst") === col("src"), col("component"))).as("old"))
        .withColumnRenamed("src", "doc")
        .localCheckpoint(false)
      pendingUnpersist ::= labels
      labels = next
      iter += 1
      // batched probe: only pay the synchronous materialization every
      // probeEvery rounds (and on the last permitted round)
      if (iter % probeEvery == 0 || iter == maxIters) converged = probe()
    }
    freeLocalCheckpoint(edges) // Dataset.unpersist is a no-op on these
    labels.select("doc", "component")
  }

  /** Portable md5-family MinHash signatures: (doc, sig ARRAY<STRING>).
    * Family i's value is the lexicographic minimum of
    * `md5(i + ":" + shingle)` over the doc's distinct shingles — a total
    * order any engine computes identically. */
  def minhashSignaturesPortable(docs: DataFrame, idCol: String,
                                textCol: String, numHashes: Int = 16,
                                shingleN: Int = 5): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), Text.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc"),
        explode(Text.shinglesFromTokens(col("toks"), shingleN)).as("shingle"))
      .distinct()
    val minCols = (0 until numHashes).map(i =>
      min(md5(concat_ws(":", lit(i.toString), col("shingle")))).as(s"h$i"))
    sh.groupBy("doc").agg(minCols.head, minCols.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding of portable signatures: (doc, band, bh) — band b's bucket
    * key is the md5 of its `numHashes/bands` signature positions. */
  private[graft] def bandedPortable(sig: DataFrame, numHashes: Int,
                                    bands: Int): DataFrame = {
    val r = numHashes / bands
    sig.select(col("doc"), posexplode(
        array((0 until bands).map(b =>
          md5(concat_ws("|", (0 until r).map(j => col("sig")(b * r + j)): _*))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** MinHash near-dups, PORTABLE twin: hash families are md5 hex STRINGS
    * (`md5(i + ":" + shingle)`), whose lexicographic minimum is a total
    * order any engine computes identically — so the whole MinHash algebra
    * (k-family signature → banded bucket hashes → candidate pairs →
    * estimated Jaccard as matching-position fraction) is verifiable
    * bit-for-bit against an independent SQL engine. The xxhash64 form
    * ([[minhashNearDups]]) stays the scale default (8-byte longs instead
    * of 32-char strings in every shuffle, ~k× cheaper hashing); this twin
    * exists so the ALGORITHM, not just its spec, sits under the oracle. */
  def minhashNearDupsPortable(docs: DataFrame, idCol: String, textCol: String,
                              numHashes: Int = 16, bands: Int = 8,
                              shingleN: Int = 5,
                              minEstJaccard: Double = 0.3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // signature feeds banding + both sides of the estimation join.
    // UNCAPPED (maxBucket = Int.MaxValue): this twin is the oracle anchor
    // and must mirror its DuckDB SQL bit-for-bit, cap included or not —
    // the scale default ([[minhashNearDups]]) carries the bucket cap.
    val sig = tracked(minhashSignaturesPortable(docs, idCol, textCol,
      numHashes, shingleN))
    bandedCandidates(bandedPortable(sig, numHashes, bands), sig,
      numHashes, minEstJaccard, maxBucket = Int.MaxValue)
  }

  /** Min-id row per batch fingerprint WITHOUT a per-fp window OR a sort:
    * [[Ranking.keepSmallestK]] with k=1 — a size-1 heap in an
    * ObjectHashAggregate, so a viral fingerprint's occurrences collapse
    * in map-side partials and no task sorts anything (the same de-skew
    * discipline as [[dedupParagraphs]]'s canonical; note `min_by(struct)`
    * would NOT do — declarative aggregates with struct buffers fall back
    * to SortAggregate, which re-sorts every partition by the key). Same
    * single fp exchange as the window form. Drops the fingerprint.
    *
    * Inherits [[Ranking.keepSmallestK]]'s thin-orderable-rows contract:
    * every `batch` column rides inside the k=1 heap entry, so ingestion
    * batches must carry orderable columns only (the (id, text) shape
    * every caller here has — a MapType payload column fails analysis;
    * project it off or route it through [[Ranking.keepSmallestKIds]]). */
  private def firstPerFingerprint(fresh: DataFrame, idCol: String): DataFrame =
    Ranking.keepSmallestK(fresh, "fingerprint", Seq(col(idCol)), 1)
      .drop("fingerprint")

  /** Incremental exact dedup: rows of `batch` that are new BOTH against a
    * fingerprint `store` (the corpus already kept — one `fingerprint`
    * column) AND within the batch itself (min-id wins). The production
    * shape for rolling corpus ingestion: the store is the big side and
    * arrives pre-hashed, so the anti-join is a plain fingerprint
    * equi-join — bucket the store by fingerprint and ingestion never
    * reshuffles it. Batch columns must all be ORDERABLE (the min-id
    * canonical is a heap aggregate whose entry embeds the whole batch
    * row — [[firstPerFingerprint]]); the (id, text) ingestion shape
    * always is. */
  def newAgainstStore(batch: DataFrame, idCol: String, textCol: String,
                      store: DataFrame): DataFrame = {
    val fp = batch.withColumn("fingerprint", md5(col(textCol)))
    val fresh = fp.join(store.select("fingerprint"), Seq("fingerprint"), "left_anti")
    firstPerFingerprint(fresh, idCol)
  }

  /** [[newAgainstStore]] with a Bloom pre-filter — the 100 TB shape of
    * exact-dedup ingestion. A Bloom sketch of the store's fingerprints
    * (built distributively by Spark's `BloomFilterAggregate`, collected
    * once) pre-filters the batch IN-ROW: rows whose fingerprint the
    * sketch has definitely never seen skip the store join entirely; only
    * the "maybe" rows — true duplicates plus an `fpp` fraction of false
    * positives — pay the anti-join against history. Bloom filters have
    * no false negatives and every maybe is confirmed exactly, so the
    * result row set is IDENTICAL to [[newAgainstStore]] (spec-proven;
    * the query shares its oracle).
    *
    * Scale sizing: the sketch costs ~1.44·log2(1/fpp) bits per store row
    * (`BloomFilter.optimalNumOfBits`), BUT Spark's `BloomFilterAggregate`
    * enforces session ceilings at analysis time —
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M
    * items) and `...maxNumBits` (default 2^26 bits = 8 MB, reached near
    * ~7M items at fpp=0.01). The require below re-states those ceilings
    * as a named error instead of the aggregate's opaque
    * DataTypeMismatch. Past the default ceilings, either raise both
    * confs (a 10^9-row store at 1% fpp needs ~1.4 GB of bits — viable as
    * a task-binary constant but size executor memory for it), raise
    * `fpp` (every maybe is re-checked exactly, so correctness never
    * depends on it), or shard the store and ingest per shard. The win:
    * on a mostly-fresh batch (the common
    * rolling-crawl case) the store join's probe side shrinks from
    * |batch| to ~|dups| + fpp·|batch|, and with a fingerprint-bucketed
    * store the surviving join stays Exchange-free on history — the
    * sketch replaces a full batch shuffle with a map-only filter. */
  def newAgainstStoreBloom(batch: DataFrame, idCol: String, textCol: String,
                           store: DataFrame, expectedItems: Long,
                           fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      "newAgainstStoreBloom needs expectedItems > 0 and fpp in (0, 1)")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate rejects sketches past these session ceilings
    // at ANALYSIS time with an opaque DataTypeMismatch; fail here by name
    // with the actionable choices instead.
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"newAgainstStoreBloom: expectedItems=$expectedItems needs numBits=" +
        s"$numBits, exceeding the session Bloom ceilings (" +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems, " +
        s"maxNumBits=$maxBits). Raise both confs for a bigger sketch, " +
        "raise fpp (maybes are re-checked exactly; correctness is " +
        "unaffected), or shard the store and ingest per shard")
    // one distributed pass over history; the single sketch row collects
    // to the driver (null when the store is empty → nothing to filter)
    val sketch = store
      .agg(graft.plans.Bloom.bloomAgg(xxhash64(col("fingerprint")),
        expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fp = batch.withColumn("fingerprint", md5(col(textCol)))
    val fresh =
      if (sketch == null) fp
      else {
        val maybe = graft.plans.Bloom.mightContain(sketch,
          xxhash64(col("fingerprint")))
        // definite-new rows bypass the join; maybes confirm exactly
        fp.filter(!maybe).unionByName(
          fp.filter(maybe).join(store.select("fingerprint"),
            Seq("fingerprint"), "left_anti"))
      }
    firstPerFingerprint(fresh, idCol)
  }

  /** Incremental NEAR-dup ingestion: rows of `batch` that are near-dup-new
    * BOTH against a signature store (the kept corpus's precomputed MinHash
    * signatures — (doc, sig) as [[minhashSignaturesPortable]] emits) AND
    * within the batch itself (connected near-dup components collapse to
    * their minimum id). The exact-hash form ([[newAgainstStore]]) catches
    * byte-equal re-ingests; this catches the re-crawled page with a new
    * timestamp, the boilerplate-wrapped syndication copy — the dominant
    * duplication mode in rolling web ingestion.
    *
    * Scale shape: history signatures are computed ONCE at ingest time and
    * never recomputed — each new batch hashes only itself (batch-sized
    * shingle work), then meets the store in banded equi-joins keyed on
    * (band, band-hash). Persist the store PRE-BANDED and bucketed on the
    * composite band key ([[graft.sources.Sinks.bucketedTableOn]], proven
    * Exchange-free in `PlanAuditSpec`) and ingestion never
    * shuffles history at all — the same discipline as
    * [[newAgainstStore]]'s fingerprint store, generalized to near-dup
    * identity. BOTH sides of the store join are capped at `LshMaxBucket`
    * (overflow-list anti-join, so singletons still pair), and the
    * within-batch self-join runs through the shared capped
    * [[bandedCandidates]] stage: a degenerate hot bucket bounds at
    * LshMaxBucket² candidates instead of B·b. The recall trade is the
    * same as every cap here — a >LshMaxBucket bucket is a near-exact
    * flood that exact dedup should have consumed first.
    *
    * Policy: (1) batch docs sharing a band bucket with a store doc AND
    * estimated Jaccard ≥ `minEstJaccard` are dropped; (2) remaining batch
    * docs near-dup to EACH OTHER collapse via [[keepCanonical]] (min-id
    * component canonical). A batch doc whose only near-dup partner was
    * itself dropped in (1) survives — transitive store identity is a
    * CHOICE left to the caller (run components over batch∪store pair sets
    * when syndication chains matter). */
  def newAgainstStoreMinhash(batch: DataFrame, idCol: String, textCol: String,
                             storeSigs: DataFrame, numHashes: Int = 16,
                             bands: Int = 8, shingleN: Int = 5,
                             minEstJaccard: Double = 0.3,
                             storeBanded: Option[DataFrame] = None): DataFrame =
    newAgainstStoreCore(batch, idCol, textCol, storeSigs, numHashes, bands,
      minEstJaccard, storeBanded,
      docs => minhashSignaturesPortable(docs, idCol, textCol, numHashes, shingleN),
      sig => bandedPortable(sig, numHashes, bands))

  /** [[newAgainstStoreMinhash]] with the xxhash64 signature family — the
    * SCALE DEFAULT for ingestion: in-row [[graft.plans.MinHashSig]]
    * signatures (no shingle explode/groupBy) and 8-byte BIGINT band keys
    * instead of k×32-char md5 strings in every shuffle. Store schema is
    * `(doc, sig ARRAY<BIGINT>)`; a pre-banded store is `(doc, band, bh
    * BIGINT)`. Policy and topology are IDENTICAL to the portable form —
    * `DedupSpec` proves keep-set equality on a planted corpus, which is
    * how this path inherits the md5 twin's oracle anchoring. */
  def newAgainstStoreMinhashFast(batch: DataFrame, idCol: String, textCol: String,
                                 storeSigs: DataFrame, numHashes: Int = 32,
                                 bands: Int = 8, shingleN: Int = 5,
                                 minEstJaccard: Double = 0.3,
                                 storeBanded: Option[DataFrame] = None): DataFrame =
    newAgainstStoreCore(batch, idCol, textCol, storeSigs, numHashes, bands,
      minEstJaccard, storeBanded,
      docs => minhashSignatures(docs, idCol, textCol, numHashes, shingleN),
      sig => bandedXxhash(sig, numHashes, bands))

  /** Output shape a [[newAgainstStoreCore]] caller declares. The core
    * emits keep sets today; [[IngestPairs]] is reserved so a future
    * pair-shaped extension is forced to confront the band-key fold
    * contract AT CONSTRUCTION (the require below fails by name) instead
    * of shipping a path whose 64-bit key collisions surface as spurious
    * pairs under the oracle. */
  private[graft] sealed trait IngestOutput
  private[graft] case object IngestKeepSet extends IngestOutput
  private[graft] case object IngestPairs extends IngestOutput

  private[graft] def newAgainstStoreCore(batch: DataFrame, idCol: String,
                                  textCol: String, storeSigs: DataFrame,
                                  numHashes: Int, bands: Int,
                                  minEstJaccard: Double,
                                  storeBanded: Option[DataFrame],
                                  signatures: DataFrame => DataFrame,
                                  banding: DataFrame => DataFrame,
                                  output: IngestOutput = IngestKeepSet): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Band keys shuffle through every stage below (two cap aggregates +
    // join-backs, the store join, the within-batch self-join). The md5
    // family's 32-char string keys made those shuffles the dominant cost
    // (measured 2× on the incr bench) — fold any string bh to an 8-byte
    // long up front. Bucket identity is preserved modulo 64-bit hash
    // collisions, which the est-Jaccard filter absorbs; the pair-output
    // ORACLE twins ([[minhashNearDupsPortable]]) never pass through here.
    //
    // EXCEPTION: a caller-persisted `storeBanded` with STRING keys keeps
    // them, on BOTH sides — folding would derive a new join column and
    // throw away the store's bucket co-location, the whole point of
    // persisting pre-banded history. (To get long keys AND co-location,
    // persist the store already folded — `xxhash64(bh)` — or use the fast
    // family, whose keys are born BIGINT.)
    //
    // CONTRACT (enforced at construction, not by comment): the fold is
    // sound ONLY for keep-set outputs — a 64-bit band-key collision
    // creates spurious bucket co-residency that the est-Jaccard filter
    // absorbs for keeps but would surface in a pair output. The
    // pair-emitting oracle twins ([[minhashNearDupsPortable]] etc.) build
    // their own banding and never reach this fold; a future pair-shaped
    // caller of THIS core fails here by name (DedupSpec has the negative
    // test) instead of as an opaque oracle mismatch.
    val useLongKeys = storeBanded.forall(
      _.schema("bh").dataType != org.apache.spark.sql.types.StringType)
    require(output == IngestKeepSet || !useLongKeys,
      "newAgainstStoreCore: the 64-bit band-key fold is keep-set-only — " +
        "a band-key collision would surface as a spurious pair in a " +
        "pair-shaped output. Keep native band keys (pass a string-keyed " +
        "storeBanded) or use the pair operators (minhashNearDups / " +
        "minhashNearDupsPortable) instead")
    def longKeyed(banded: DataFrame): DataFrame =
      if (useLongKeys &&
          banded.schema("bh").dataType == org.apache.spark.sql.types.StringType)
        banded.withColumn("bh", xxhash64(col("bh")))
      else banded
    val batchSigs = tracked(signatures(batch))
    val store = tracked(storeSigs.select(col("doc"), col("sig")))
    val bBatch = tracked(longKeyed(banding(batchSigs)))
    // storeBanded: the (doc, band, bh) table persisted AT INGEST TIME,
    // bucketed on (band, bh) (Sinks.bucketedTableOn — the full composite
    // join key, or Spark disables the bucketed scan) — the join then
    // plans with NO Exchange above the history scan (PlanAuditSpec);
    // without it the banding is recomputed from the signatures here
    // tracked: the cap below reads bStore twice (aggregate + join-back);
    // without the persist the store banding (and signature scan) re-runs
    val bStore = tracked(longKeyed(storeBanded.getOrElse(banding(store))))
    def est(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => x === y), p => p))
        .cast("double") / lit(numHashes.toDouble)
    // Degenerate-bucket guard (the one scale-killer in this topology): a
    // hot (band, bh) bucket with B store docs and b batch docs enumerates
    // B·b candidates unbounded. Cap EACH side at LshMaxBucket before the
    // join — enforcement is a broadcast anti-join against the tiny
    // overflow list (capBuckets scaladoc), so the bucketed-store scan
    // stays Exchange-free and history never reshuffles.
    // tracked: the capped batch banding feeds BOTH the store join and the
    // within-batch self-join below
    val bStoreCapped = capBuckets(bStore, Seq("band", "bh"), LshMaxBucket)
    val bBatchCapped = tracked(capBuckets(bBatch, Seq("band", "bh"), LshMaxBucket))
    // batch-vs-store: candidate (batch doc, store doc) per shared bucket.
    // No pair-level distinct before the estimate: a pair sharing k of the
    // `bands` buckets is estimated k times (est is a cheap in-row zip over
    // signatures already joined in), which costs less than a full
    // (doc, sdoc) exchange; the ONE distinct that matters — rejected batch
    // docs — happens after the filter on a doc-only column.
    val storeHits = bBatchCapped.select(col("band"), col("bh"), col("doc"))
      .join(bStoreCapped.select(col("band"), col("bh"), col("doc").as("sdoc")),
        Seq("band", "bh"))
      .join(batchSigs.select(col("doc"), col("sig")), Seq("doc"))
      .join(store.select(col("doc").as("sdoc"), col("sig").as("ssig")),
        Seq("sdoc"))
      .filter(est(col("sig"), col("ssig")) >= minEstJaccard)
      .select("doc").distinct()
    // hits is small (≤ batch size) and feeds three consumers below
    val hits = tracked(storeHits)
    val fresh = tracked(batch.join(
      hits.withColumnRenamed("doc", idCol), Seq(idCol), "left_anti"))
    // within-batch pairs among SURVIVORS only (a batch doc whose only
    // near-dup partner was store-rejected must survive — class doc).
    // Computed as all-batch pairs from the ALREADY-capped banding, then
    // two anti-joins against the small hit list — cheaper than semi-
    // joining the banded rows against fresh (banded rows ≫ pairs), and
    // equivalent: pair membership doesn't depend on fresh-ness.
    val allPairs = bandedCandidates(bBatchCapped, batchSigs, numHashes,
      minEstJaccard, maxBucket = Int.MaxValue) // already capped upstream
      .select("doc_a", "doc_b")
    val pairs = allPairs
      .join(hits.withColumnRenamed("doc", "doc_a"), Seq("doc_a"), "left_anti")
      .join(hits.withColumnRenamed("doc", "doc_b"), Seq("doc_b"), "left_anti")
    output match {
      case IngestKeepSet => keepCanonical(fresh, idCol, pairs)
      case IngestPairs => throw new UnsupportedOperationException(
        "newAgainstStoreCore: pair output is reserved — implement it " +
          "against native (unfolded) band keys before wiring a caller")
    }
  }

  /** Per-stage wall-time instrumentation for the incremental near-dup
    * ingestion families — the profiling face of [[newAgainstStoreCore]],
    * the way [[jaccardStageCounts]] is the accounting face of
    * [[jaccardNearDups]]. Mirrors the core's stages exactly (same
    * operators, same persists) but forces each with an action so the
    * deltas attribute wall time to: batch signature build, store
    * signature build, banding + bucket caps, the batch-vs-store rejection
    * join, within-batch candidate pairs, and the component collapse.
    * Persisted parents mean each delta measures ONLY its own stage's
    * incremental work. `portable` selects the md5-string family so the
    * two families' breakdowns are comparable side by side. */
  def ingestStageTimes(batchDocs: DataFrame, idCol: String, textCol: String,
                       storeDocs: DataFrame, numHashes: Int = 32,
                       bands: Int = 8, shingleN: Int = 5,
                       minEstJaccard: Double = 0.3,
                       portable: Boolean = false): Map[String, Double] = {
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val signatures: DataFrame => DataFrame =
      if (portable) d => minhashSignaturesPortable(d, idCol, textCol, numHashes, shingleN)
      else d => minhashSignatures(d, idCol, textCol, numHashes, shingleN)
    val banding: DataFrame => DataFrame =
      if (portable) s => bandedPortable(s, numHashes, bands)
      else s => bandedXxhash(s, numHashes, bands)
    def longKeyed(banded: DataFrame): DataFrame =
      if (banded.schema("bh").dataType == org.apache.spark.sql.types.StringType)
        banded.withColumn("bh", xxhash64(col("bh")))
      else banded
    val batchSigs = tracked(signatures(batchDocs).select(col("doc"), col("sig")))
    val tSigBatch = sec(batchSigs.count())
    val store = tracked(signatures(storeDocs).select(col("doc"), col("sig")))
    val tSigStore = sec(store.count())
    val bBatchCapped = tracked(
      capBuckets(longKeyed(banding(batchSigs)), Seq("band", "bh"), LshMaxBucket))
    val bStoreCapped = tracked(
      capBuckets(longKeyed(banding(store)), Seq("band", "bh"), LshMaxBucket))
    val tBandCap = sec { bBatchCapped.count(); bStoreCapped.count() }
    def est(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => x === y), p => p))
        .cast("double") / lit(numHashes.toDouble)
    val hits = tracked(bBatchCapped.select(col("band"), col("bh"), col("doc"))
      .join(bStoreCapped.select(col("band"), col("bh"), col("doc").as("sdoc")),
        Seq("band", "bh"))
      .join(batchSigs.select(col("doc"), col("sig")), Seq("doc"))
      .join(store.select(col("doc").as("sdoc"), col("sig").as("ssig")), Seq("sdoc"))
      .filter(est(col("sig"), col("ssig")) >= minEstJaccard)
      .select("doc").distinct())
    val tStoreJoin = sec(hits.count())
    val pairs = tracked(
      bandedCandidates(bBatchCapped, batchSigs, numHashes, minEstJaccard,
        maxBucket = Int.MaxValue)
        .select("doc_a", "doc_b")
        .join(hits.withColumnRenamed("doc", "doc_a"), Seq("doc_a"), "left_anti")
        .join(hits.withColumnRenamed("doc", "doc_b"), Seq("doc_b"), "left_anti"))
    val tBatchPairs = sec(pairs.count())
    val fresh = batchDocs.join(hits.withColumnRenamed("doc", idCol),
      Seq(idCol), "left_anti")
    val tComponents = sec(
      keepCanonical(fresh, idCol, pairs).write.format("noop")
        .mode("overwrite").save())
    unpersistIntermediates()
    Map(
      "sig_batch" -> tSigBatch, "sig_store" -> tSigStore,
      "band_cap" -> tBandCap, "store_join" -> tStoreJoin,
      "batch_pairs" -> tBatchPairs, "components" -> tComponents)
  }

  /** foreachBatch body for STREAMING near-dup ingestion: dedup `batch`
    * against the persistent signature table (created on first batch),
    * append the survivors' signatures so later micro-batches reject
    * near-dups of everything kept so far, and return the survivors for
    * the caller's corpus sink. The streaming face of
    * [[newAgainstStoreMinhash]]: within a micro-batch the policy is
    * identical (store rejection, then min-id component collapse); across
    * micro-batches it is first-seen-wins in ARRIVAL order — equal to the
    * one-shot min-id collapse whenever ingestion order follows ids and
    * near-dup chains don't straddle batch boundaries (rejected docs'
    * signatures are deliberately NOT stored, matching the batch
    * operator's fresh-only pairing).
    *
    * Scale: the signature table grows by survivors only and is read once
    * per micro-batch; persist it bucketed on the composite band key
    * ([[graft.sources.Sinks.bucketedTableOn]] discipline) and each
    * micro-batch's store join is shuffle-free on the history side. */
  def ingestMinhash(spark: org.apache.spark.sql.SparkSession,
                    batch: DataFrame, idCol: String, textCol: String,
                    sigTable: String, numHashes: Int = 16, bands: Int = 8,
                    shingleN: Int = 5, minEstJaccard: Double = 0.3,
                    epochId: Option[Long] = None): DataFrame =
    ingestCore(spark, sigTable, epochId,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType),
      kept => minhashSignaturesPortable(kept, idCol, textCol, numHashes, shingleN),
      store => newAgainstStoreMinhash(batch, idCol, textCol, store,
        numHashes, bands, shingleN, minEstJaccard))

  /** [[ingestMinhash]] with the xxhash64 family
    * ([[newAgainstStoreMinhashFast]]): `(doc, sig ARRAY<BIGINT>, epoch)`
    * store rows, BIGINT band keys in every shuffle — the scale default
    * for streaming ingestion. */
  def ingestMinhashFast(spark: org.apache.spark.sql.SparkSession,
                        batch: DataFrame, idCol: String, textCol: String,
                        sigTable: String, numHashes: Int = 32, bands: Int = 8,
                        shingleN: Int = 5, minEstJaccard: Double = 0.3,
                        epochId: Option[Long] = None): DataFrame =
    ingestCore(spark, sigTable, epochId,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType),
      kept => minhashSignatures(kept, idCol, textCol, numHashes, shingleN),
      store => newAgainstStoreMinhashFast(batch, idCol, textCol, store,
        numHashes, bands, shingleN, minEstJaccard))

  /** Shared ingestion body. Replay idempotence (at-least-once foreachBatch):
    * signatures are stored WITH the writing epoch, the store view used for
    * rejection excludes the current epoch and later (`epoch < e`), and a
    * replayed epoch OVERWRITES its own partition (dynamic partition
    * overwrite) rather than appending or skipping. A replayed micro-batch
    * therefore (a) cannot see its own prior partial append — no
    * self-rejection; (b) cannot double-append; and (c) REPAIRS a prior
    * attempt that crashed after a partial commit (possible on object
    * stores / non-atomic committers where some task output becomes
    * visible): the keep set is a deterministic function of strictly-earlier
    * history, so the rewrite is byte-stable. Batch-mode callers (no
    * epochId) keep the old contract: reject against the whole store,
    * always append, epoch recorded as -1. */
  private def ingestCore(spark: org.apache.spark.sql.SparkSession,
                         sigTable: String, epochId: Option[Long],
                         sigType: org.apache.spark.sql.types.ArrayType,
                         signatures: DataFrame => DataFrame,
                         dedup: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val raw =
      if (spark.catalog.tableExists(sigTable)) spark.table(sigTable)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc", LongType),
          StructField("sig", sigType), StructField("epoch", LongType))))
    // LEGACY stores (created before the epoch column existed) read as
    // epoch -1 — always visible — and are appended to WITHOUT the epoch
    // column (appending a 3-column frame into a 2-column table is an
    // AnalysisException, not schema evolution). Replay idempotence
    // therefore only holds for epoch-capable stores; a legacy store keeps
    // the old at-least-once behavior until rewritten. New/empty stores
    // are always created epoch-capable.
    val legacy = spark.catalog.tableExists(sigTable) &&
      !raw.columns.contains("epoch")
    val store = if (legacy) raw.withColumn("epoch", lit(-1L)) else raw
    val exists = spark.catalog.tableExists(sigTable)
    val visible = epochId match {
      case Some(e) => store.filter(col("epoch") < e)
      case None => store
    }
    // localCheckpoint (eager): cut lineage BEFORE the store write below
    // mutates sigTable — a lazy `kept` recomputed afterwards would see
    // its own signatures in the store and reject every survivor
    val kept = dedup(visible.select(col("doc"), col("sig"))).localCheckpoint()
    val sigRows = signatures(kept)
    if (legacy) sigRows.write.mode("append").saveAsTable(sigTable)
    else {
      // Partitioned by epoch: the `epoch < e` visibility filter is
      // partition-pruned instead of a full store scan per micro-batch;
      // partition count is bounded by the number of micro-batches since
      // the last [[compactSignatureStore]].
      val stamped = sigRows.withColumn("epoch", lit(epochId.getOrElse(-1L)))
      if (!exists) {
        // crash-debris guard (Sinks.ensureWritableTable scaladoc): a prior
        // run killed mid-create can leave the managed location on disk
        // with no catalog entry, and the fresh create would then die with
        // LOCATION_ALREADY_EXISTS instead of starting the store over
        graft.sources.Sinks.ensureWritableTable(spark, sigTable)
        stamped.write.partitionBy("epoch").saveAsTable(sigTable)
      }
      else epochId match {
        case Some(e) =>
          // The overwrite path is safe ONLY on the layout ingestCore
          // itself creates: epoch as the SOLE partition column. "Some
          // column is a partition column" was too weak — an externally
          // created table partitioned on doc (or on (doc, epoch)) would
          // take this path and overwrite partitions keyed on the wrong
          // column. Anything else falls back to the append-if-absent
          // guard below.
          val partitioned = spark.catalog.listColumns(sigTable)
            .collect().filter(_.isPartition).map(_.name).toSeq == Seq("epoch")
          if (partitioned) {
            // Dynamic partition overwrite of exactly this epoch: replay
            // rewrites (never duplicates) its own partition, and a partial
            // prior commit is replaced wholesale instead of being trusted
            // as complete. insertInto maps columns BY POSITION — select
            // into the table's declared order first, so an externally
            // created (sig, doc) PARTITIONED BY (epoch) table can't get
            // its columns swapped silently.
            val ordered = stamped.select(
              spark.table(sigTable).columns.map(col(_)): _*)
            val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try ordered.write.mode("overwrite").insertInto(sigTable)
            finally prev.fold(
              spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
              spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
          } else {
            // Epoch-capable but NOT epoch-partitioned (externally created
            // table): a dynamic overwrite here would replace the WHOLE
            // table, so replay falls back to the append-if-absent guard —
            // idempotent against double-append, though a partial prior
            // commit is then trusted as complete (the partitioned layout
            // ingestCore itself creates has the stronger repair property).
            val present = store.filter(col("epoch") === e).limit(1).count() > 0
            if (!present) stamped.write.mode("append").saveAsTable(sigTable)
          }
        case None =>
          stamped.write.mode("append").partitionBy("epoch").saveAsTable(sigTable)
      }
    }
    kept
  }

  /** Compact an epoch-partitioned signature store: fold every epoch
    * STRICTLY BELOW `upToEpoch` (including any prior compacted mass at
    * epoch -1) into the single always-visible epoch -1 partition, so a
    * long-running stream's partition count stays bounded by
    * micro-batches-since-last-compaction instead of growing one
    * partition per micro-batch forever — the signature store's analogue
    * of the reference's TTL-bounded SQLite cache (utils/cache.py).
    *
    * WATERMARK CONTRACT: `upToEpoch` must be ≤ the stream's committed
    * watermark — i.e. strictly below any epoch the checkpoint can still
    * re-deliver AND below any epoch currently being written. Under that
    * contract compaction may interleave with live ingestion freely:
    *  - epoch -1 is visible to EVERY epoch's rejection view (`epoch < e`,
    *    e ≥ 0), so an in-flight epoch N ≥ upToEpoch sees exactly the same
    *    visible signature SET before, during, and after compaction (rows
    *    move from partitions [0, upToEpoch) into -1; none appear or
    *    vanish) — keep sets are unchanged;
    *  - epoch N's own partition is untouched (only epochs < upToEpoch are
    *    folded and dropped), so a later replay of N still overwrites a
    *    partition holding exactly N's rows — replay idempotence is
    *    preserved. `StreamingSpec` proves both under an interleaved
    *    ingest/compact/replay schedule.
    * Compacting THROUGH a replayable epoch breaks replay only: the
    * replayed epoch would see its own folded signatures in -1 and
    * self-reject. Rejection semantics for fresh epochs survive even that.
    *
    * Crash safety: the compacted rows are written (dynamic partition
    * overwrite of epoch -1) BEFORE the source epochs are dropped. A crash
    * between the two steps leaves duplicate signatures visible in both
    * -1 and their original epochs — harmless for rejection (duplicate
    * store rows produce duplicate candidates, absorbed by the policy's
    * distinct), and healed by re-running compaction: the compacted frame
    * dedups on `doc` (unique among survivors — a kept doc's signature is
    * written exactly once across all epochs), so re-folding epochs whose
    * rows already reached -1 cannot bake duplicates into the store. */
  def compactSignatureStore(spark: org.apache.spark.sql.SparkSession,
                            sigTable: String, upToEpoch: Long): Unit = {
    require(upToEpoch >= 0, "upToEpoch must be >= 0")
    require(spark.table(sigTable).columns.contains("epoch"),
      s"$sigTable is a pre-epoch legacy store; nothing to compact")
    // An epoch COLUMN alone is not enough: on an unpartitioned (or
    // differently-partitioned) epoch-capable store the dynamic "overwrite"
    // below would replace the WHOLE table with only the pre-upToEpoch
    // rows — destroying every epoch >= upToEpoch before the partition
    // DROP even gets to throw. Require the exact layout ingestCore itself
    // creates (epoch as the sole partition column), mirroring the replay
    // gate's check, and fail by name otherwise.
    val partCols = spark.catalog.listColumns(sigTable).collect()
      .filter(_.isPartition).map(_.name).toSeq
    require(partCols == Seq("epoch"),
      s"compactSignatureStore: $sigTable must be partitioned by epoch " +
        s"(sole partition column); found [${partCols.mkString(", ")}] — " +
        "a dynamic overwrite on this layout would replace the whole table")
    val epochs = spark.table(sigTable).select("epoch").distinct()
      .collect().map(_.getLong(0)).filter(e => e >= 0 && e < upToEpoch)
    if (epochs.isEmpty) return
    // materialize BEFORE overwriting the partition the read depends on;
    // select into the table's declared column order (insertInto is
    // positional) so an externally created (sig, doc) layout can't swap
    val compacted = spark.table(sigTable)
      .filter(col("epoch") < upToEpoch)
      .select(col("doc"), col("sig")).dropDuplicates("doc")
      .withColumn("epoch", lit(-1L))
      .select(spark.table(sigTable).columns.map(col(_)): _*)
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try compacted.write.mode("overwrite").insertInto(sigTable)
    finally prev.fold(
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    epochs.foreach(e =>
      spark.sql(s"ALTER TABLE $sigTable DROP IF EXISTS PARTITION (epoch=$e)"))
  }

  /** The dedup KEEP-list: every doc not in any near-dup pair, plus the
    * canonical (minimum-id) doc of each near-dup component. */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    keepFromComponents(docs, idCol, components(pairs))

  /** [[keepCanonical]] over ALREADY-COMPUTED component labels — the form
    * a caller holding a shared/memoized [[components]] result uses
    * (e.g. [[CorpusReport]] runs components once for the funnel's keep
    * list AND the audit's per-doc canonical). */
  def keepFromComponents(docs: DataFrame, idCol: String,
                         comps: DataFrame): DataFrame =
    docs.join(comps.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")

  /** Exact n-gram Jaccard near-dups. Candidates come from an inverted-index
    * self-join restricted to discriminative shingles (document frequency in
    * [2, dfMax]); exact |A∩B| is then recounted over the candidates' FULL
    * shingle sets, so the reported Jaccard is exact, not an estimate.
    *
    * Choosing `dfMax` at scale: the ceiling is a CORPUS-RELATIVE knob,
    * not a constant. It bounds per-shingle candidate fan-out (C(df,2)
    * pairs), but a shingle's df scales with how often its content recurs
    * in the corpus — on a corpus with K-fold content duplication every df
    * multiplies by K, and a ceiling tuned for the base corpus silently
    * bands out ALL shingles (zero candidates, measured directly on the
    * bench's 20×-replicated fixture). Size it from the df distribution of
    * the target corpus (e.g. a high percentile of df), and treat
    * candidate volume ≈ Σ C(df,2) over in-band shingles — computable
    * cheaply in one aggregation ([[jaccardStageCounts]]) BEFORE running
    * the quadratic stage. */
  /** Candidate-volume pre-flight: Σ df·(df−1)/2 over in-band shingles —
    * EXACTLY the ordered pairs the inverted-index self-join will
    * enumerate before any filter (the controlled probe's
    * `enumerated_pairs` reports the same formula, so estimate and
    * measurement agree by construction). One aggregation over the
    * df histogram, no pair ever materializes: run it before committing a
    * cluster to the quadratic stage, and resize `dfMax` if the answer is
    * unaffordable. */
  /** The shingle table is persisted through the shared registry (scope
    * "dedup", released by [[unpersistIntermediates]]): a caller that runs
    * the pre-flight and then the pair operator over the SAME docs frame
    * (the funnel's shape) pays the tokenize/explode pass ONCE — Spark's
    * cache manager substitutes the materialized index into the pair
    * operator's identical-plan `tracked(shingleTable(...))` call. */
  def candidateVolumeEstimate(docs: DataFrame, idCol: String, textCol: String,
                              shingleN: Int = 5, dfMax: Int = 20): Long =
    candidateVolumeFromIndex(
      tracked(shingleTable(docs, idCol, textCol, shingleN)), dfMax,
      persistHistogram = true)

  // sum LONGS and halve on the driver: Spark's `/` always yields double,
  // and df*(df-1) is even so the halving is exact.
  // persistHistogram: a pre-flight caller that will run the pair operator
  // over the SAME docs frame persists the df histogram too (scope
  // "dedup"), so the pair operator's identical groupBy(shingle) subplan
  // is cache-substituted instead of re-aggregating the whole index —
  // the estimate's two passes (index + histogram) then both amortize
  // into the pair run. Off for one-shot accounting callers
  // ([[jaccardStageCounts]]) where a persist would only cost memory.
  private def candidateVolumeFromIndex(sh: DataFrame, dfMax: Int,
                                       persistHistogram: Boolean = false): Long = {
    val hist0 = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val hist = if (persistHistogram) tracked(hist0) else hist0
    hist.filter(col("df") >= 2 && col("df") <= dfMax)
      .agg(coalesce(sum(col("df") * (col("df") - 1)), lit(0L)).as("n"))
      .head().getLong(0) / 2
  }

  /** Optional pre-flight enforcement for the quadratic operators below:
    * when `maxCandidatePairs` is set, refuse to enumerate more than that
    * many candidates — the failure names the measured volume so the
    * caller can re-run with a tighter `dfMax` instead of discovering the
    * blow-up as a dead cluster at hour nine. */
  private def guardCandidateVolume(sh: DataFrame, dfMax: Int,
                                   maxCandidatePairs: Option[Long]): Unit =
    maxCandidatePairs.foreach { m =>
      // persist the histogram: the guarded pair operator re-aggregates
      // the same df histogram right after this check
      val est = candidateVolumeFromIndex(sh, dfMax, persistHistogram = true)
      if (est > m) throw new IllegalStateException(
        s"candidate volume pre-flight: the df-banded index would enumerate " +
          s"$est pairs, over the declared budget of $m — lower dfMax or " +
          s"split the corpus")
    }

  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 5, dfMax: Int = 20,
                      minJaccard: Double = 0.5,
                      maxCandidatePairs: Option[Long] = None): DataFrame = {
    // The inverted index feeds five plan branches — persist it once.
    val sh = tracked(shingleTable(docs, idCol, textCol, shingleN))
    guardCandidateVolume(sh, dfMax, maxCandidatePairs)
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("set_size"))
    val discriminative = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= dfMax)
        .select("shingle"),
      Seq("shingle"))
    // Length-ratio prefilter, carried from INDEX granularity: sizes join
    // the (linear-sized) inverted index once, so the candidate self-join
    // emits (pair, size_a, size_b) for free and unpassable pairs die
    // BEFORE the distinct's shuffle and the shingle fan-out. The bound:
    // |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so J(A,B) ≤
    // min/max — a pair whose size ratio already misses minJaccard cannot
    // pass the exact test (no false negatives, spec-asserted with a
    // boundary pair at J == threshold). Joining sizes at pair granularity
    // instead would shuffle the quadratic side twice — measured +40% on
    // the replica fixture.
    // tracked: BOTH sides of the candidate self-join are this same frame
    // under different aliases — aliasing defeats ReuseExchange, so
    // without the persist the df-band + size annotation of the whole
    // index is computed twice, once per side.
    val withSize = tracked(discriminative.join(sizes, Seq("doc")))
    val cand = withSize
      .select(col("shingle"), col("doc").as("doc_a"), col("set_size").as("size_a"))
      .join(withSize.select(col("shingle"), col("doc").as("doc_b"),
        col("set_size").as("size_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("size_a"), col("size_b")).cast("double") /
          greatest(col("size_a"), col("size_b")).cast("double") >= minJaccard)
      .select("doc_a", "doc_b", "size_a", "size_b").distinct()
    // |A∩B| per candidate pair: fan the (small) pair list out to doc_a's
    // shingles, then inner-join on (doc_b, shingle) to keep only shared
    // ones — two equi-joins sized by the candidate set, instead of a full
    // inverted-index self-join over the whole corpus. Sizes ride through
    // the aggregate (functionally determined by the pair) so no re-join.
    cand
      .join(sh.select(col("doc").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b", "size_a", "size_b")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Per-stage candidate-volume accounting for [[jaccardNearDups]] — the
    * bench probe's direct evidence on HOW candidate volume scales with
    * corpus size at fixed true-pair volume. Emits: inverted-index rows,
    * df-banded index rows, enumerated ordered pairs (Σ C(df,2) over the
    * banded df histogram — exactly the pairs the candidate self-join
    * produces before any filter), pairs surviving the length-ratio
    * prefilter (pre-distinct), and distinct candidate pairs.
    *
    * Context (r5 postmortem): the controlled probe showed near-linear
    * TIME but a 4.2× shuffle-byte jump for 2× data. These counts plus a
    * fixed-join-strategy re-measurement showed enumeration is linear
    * (1.95× shuffle for 2× data with AQE broadcast conversion disabled);
    * the jump was AQE flipping candidate-sized joins to broadcast at r10
    * but not at r20 — a measurement artifact of the fixture straddling
    * the runtime broadcast threshold, not operator superlinearity. */
  def jaccardStageCounts(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 5, dfMax: Int = 20,
                         minJaccard: Double = 0.5): Map[String, Long] = {
    val sh = tracked(shingleTable(docs, idCol, textCol, shingleN))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("set_size"))
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val banded = dfs.filter(col("df") >= 2 && col("df") <= dfMax)
    // the SAME formula the pre-flight guard runs — probe equality between
    // estimate and measurement holds by construction
    val enumerated = candidateVolumeFromIndex(sh, dfMax)
    val discriminative = sh.join(banded.select("shingle"), Seq("shingle"))
    val withSize = discriminative.join(sizes, Seq("doc"))
    val pairs = withSize
      .select(col("shingle"), col("doc").as("doc_a"), col("set_size").as("size_a"))
      .join(withSize.select(col("shingle"), col("doc").as("doc_b"),
        col("set_size").as("size_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("size_a"), col("size_b")).cast("double") /
          greatest(col("size_a"), col("size_b")).cast("double") >= minJaccard)
    Map(
      "index_rows" -> sh.count(),
      "banded_index_rows" -> discriminative.count(),
      "enumerated_pairs" -> enumerated,
      "ratio_kept_pairs" -> pairs.count(),
      "distinct_pairs" -> pairs.select("doc_a", "doc_b").distinct().count())
  }

  /** Subset-duplication detector: containment C(A,B) = |A∩B| / min(|A|,|B|)
    * — near 1 when the smaller document sits (almost) wholly inside the
    * larger one, even when symmetric Jaccard is tiny (a 50-token quote in
    * a 5000-token page: C ≈ 1, J ≈ 0.01). The excerpt/quote/boilerplate
    * case [[jaccardNearDups]] structurally misses.
    *
    * Same df-capped inverted-index candidate generation and exact
    * recount as [[jaccardNearDups]], but deliberately WITHOUT its
    * length-ratio prefilter: size asymmetry is the signal here, not
    * grounds for pruning. */
  def containmentNearDups(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 5, dfMax: Int = 20,
                          minContainment: Double = 0.8,
                          maxCandidatePairs: Option[Long] = None): DataFrame = {
    val sh = tracked(shingleTable(docs, idCol, textCol, shingleN))
    guardCandidateVolume(sh, dfMax, maxCandidatePairs)
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("set_size"))
    val discriminative = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= dfMax)
        .select("shingle"),
      Seq("shingle"))
    // tracked for the same both-sides-of-the-self-join reason as
    // [[jaccardNearDups]]
    val withSize = tracked(discriminative.join(sizes, Seq("doc")))
    val cand = withSize
      .select(col("shingle"), col("doc").as("doc_a"), col("set_size").as("size_a"))
      .join(withSize.select(col("shingle"), col("doc").as("doc_b"),
        col("set_size").as("size_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "size_a", "size_b").distinct()
    cand
      .join(sh.select(col("doc").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b", "size_a", "size_b")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("containment", col("n_common").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select("doc_a", "doc_b", "n_common", "containment")
  }

  /** Exact duplicated-SPAN detection — substring-level dedup, the windowed
    * form of "find spans of `w` consecutive tokens that appear verbatim in
    * MORE THAN ONE document" (the cross-document half of suffix-array
    * training-data dedup; within-doc repetition is [[Repetition]]'s job).
    * Returns per doc: `(doc, n_windows, dup_windows, dup_token_frac)`
    * where `dup_token_frac` is the fraction of the doc's tokens covered by
    * at least one cross-doc duplicated window.
    *
    * Scale shape:
    *  - window hashes are built IN-ROW (one `transform` over the token
    *    array — each window is hashed once, no per-window row until the
    *    explode), carried as 8-byte xxhash64 keys by default so the two
    *    unavoidable cross-doc shuffles (df-count of each window hash, and
    *    the dup-hash join back) move longs, not w-token strings;
    *  - duplicated hashes are df-capped to [2, maxDf] like
    *    [[jaccardNearDups]]'s inverted index: boilerplate spans that occur
    *    in hundreds of documents are exactly the ones whose positions
    *    would fan out quadratically, and they signal template text that a
    *    cheaper doc-level dedup should field first;
    *  - per-doc token coverage is computed in-row from the collected dup
    *    positions (`array_distinct(flatten(sequence ranges))`), so no
    *    token-level rows ever hit an exchange.
    *
    * `portable = true` swaps xxhash64 for md5 hex strings so any engine
    * reproduces the hashes — the oracle-checked configuration; results are
    * hash-choice-invariant absent collisions (spec-asserted). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      w: Int = 8, maxDf: Int = 64,
                      portable: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      Text.tokens(lower(col(textCol))).as("toks"))
    def winStr(i: Column): Column = concat_ws(" ", slice(col("toks"), i + lit(1), lit(w)))
    // Fast path: native one-pass window hashing (TokenWindowHash64 — no
    // per-window strings, stays in codegen). Portable path: md5 of the
    // joined window text, reproducible by any engine — the oracle's form.
    // Docs shorter than w contribute no windows: FILTER them out rather
    // than branching to an empty array — a when() guard around the
    // transform drags the whole projection through the interpreted
    // CaseWhen path (higher-order lambdas are CodegenFallback) and
    // measured 3x slower than the filtered form. It would also run
    // sequence(0, n-w) DESCENDING for n < w.
    val whs =
      if (portable)
        transform(sequence(lit(0), size(col("toks")) - w), i => md5(winStr(i)))
      else graft.plans.TokenWindowHash64.tokenWindowHash(col("toks"), w)
    val eligible = toks.filter(size(col("toks")) >= w)
      .select(col("doc"), whs.as("whs"))
    // wins feeds BOTH the df count and the join-back; persist the tiny
    // (doc, pos, h) rows so the window-hash pass runs once, not twice
    val wins = tracked(eligible.select(col("doc"), posexplode(col("whs")))
      .withColumnRenamed("col", "h"))
    val dups = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val dupPerDoc = wins.join(dups, Seq("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("dup_windows"),
        collect_list(col("pos")).as("dup_pos"))
      .select(col("doc"), col("dup_windows"),
        size(array_distinct(flatten(transform(col("dup_pos"),
          p => sequence(p, p + w - 1))))).as("covered"))
    // per-doc totals for EVERY doc (short docs → 0 windows) — pure
    // arithmetic on the token count, no second window-hash evaluation
    val totals = toks.select(col("doc"),
      size(col("toks")).cast("long").as("n_toks"),
      greatest(size(col("toks")).cast("long") - lit((w - 1).toLong), lit(0L))
        .as("n_windows"))
    totals.join(dupPerDoc, Seq("doc"), "left")
      .select(col("doc"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        round(coalesce(col("covered"), lit(0)).cast("double")
          / col("n_toks").cast("double"), 5).as("dup_token_frac"))
  }

  /** Cross-doc duplicated-span REMOVAL — the dedup half of
    * [[duplicatedSpans]] (Lee et al. 2022 remove repeated substrings,
    * not whole documents): every w-token window shared by 2..maxDf docs
    * keeps its text only in the window's canonical (minimum-id) doc;
    * every other doc loses the covered tokens. Boilerplate, license
    * headers, and syndicated passages vanish corpus-wide while one copy
    * survives, and unique prose is untouched.
    *
    * Output per input doc: (doc, n_tokens, n_removed, clean_text) where
    * `clean_text` is the doc's normalized (lowercased, single-spaced)
    * token stream minus the union of its non-canonical dup windows —
    * span identity is case-insensitive, matching the detector.
    *
    * Scale shape mirrors the detector: in-row window hashing (native
    * one-pass [[graft.plans.TokenWindowHash64]]), ONE window-granularity
    * aggregate carrying both the df band and the canonical min-id, an
    * 8-byte-key join back, and in-row interval union + token filtering —
    * the only shuffles move (hash, doc, pos) triples. Output is
    * hash-CHOICE-invariant (the hash is only a join key; equal windows
    * hash equal under any function), so the xxhash64 default is
    * oracle-verifiable against an md5 recompute. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            w: Int = 8, maxDf: Int = 64): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      Text.tokens(lower(col(textCol))).as("toks"))
    val eligible = toks.filter(size(col("toks")) >= w)
      .select(col("doc"),
        graft.plans.TokenWindowHash64.tokenWindowHash(col("toks"), w).as("whs"))
    val wins = tracked(eligible.select(col("doc"), posexplode(col("whs")))
      .withColumnRenamed("col", "h"))
    // df band and canonical owner in ONE aggregate over the window table
    val banded = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("df"), min(col("doc")).as("canon"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h", "canon")
    val removed = wins.join(banded, Seq("h"))
      .filter(col("doc") =!= col("canon"))
      .groupBy(col("doc"))
      .agg(collect_list(col("pos")).as("ps"))
      .select(col("doc"), array_distinct(flatten(transform(col("ps"),
        p => sequence(p, p + w - 1)))).as("rem"))
    toks.join(removed, Seq("doc"), "left")
      .select(col("doc"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(size(col("rem")), lit(0)).cast("long").as("n_removed"),
        // native one-pass reassembly (r19): replaces the interpreted
        // O(len × |rem|) filter/array_contains lambda — see SpanScrub
        graft.plans.JoinTokensExcept.joinExcept(col("toks"), col("rem"))
          .as("clean_text"))
  }

  /** MAXIMAL duplicated spans — the genuine Lee et al. (2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499) substring primitive the fixed-width
    * [[duplicatedSpans]] approximates at w-token grain: for every token
    * position, the LONGEST span starting there that occurs at ≥2
    * distinct (doc, position) sites corpus-wide (overlapping
    * occurrences count, as in the suffix-array formulation), reported
    * only where MAXIMAL — at least `minLen` tokens, and not extendable
    * one token left or right while staying duplicated. Output:
    * (doc, pos, span_len, span), one row per maximal occurrence.
    *
    * The reference algorithm is a suffix array — a sequential build. The
    * Spark-shaped EXACT equivalent is ITERATIVE WINDOW DOUBLING,
    * O(log maxSpanLen) passes, candidate-bounded like the jaccard
    * funnel:
    *
    *  1. SEEDS: positions whose minLen-window is duplicated (one in-row
    *     gram pass + one hash-keyed aggregate, the [[duplicatedSpans]]
    *     plan shape). A prefix of a duplicated span is duplicated, so
    *     every position with maxdup ≥ minLen is a seed — the corpus's
    *     non-duplicated bulk exits here and never pays another pass.
    *  2. LADDER: probe lengths minLen·2^j. Survivors of round j with
    *     rem ≥ 2L re-test at 2L; counting within the survivor set is
    *     EXACT, because any other occurrence of a duplicated 2L-gram has
    *     maxdup ≥ 2L and therefore survived round j too. Each seed
    *     exits with a bracket lo ≤ maxdup < hi = min(2·lo, rem+1).
    *  3. RESOLVE: one explode of every length in [minLen, hi) per seed,
    *     one (len, gram-hash)-keyed aggregate, max duplicated length per
    *     position. Σ(hi − minLen) ≤ Σ 2·maxdup — OUTPUT-bounded, which
    *     is the doubling's whole point: without the bracket this explode
    *     is doc-length-bounded (the quadratic suffix blow-up). Counting
    *     at any probe length p stays exact inside the explode because
    *     every position with maxdup ≥ p has hi > p and emits its p-row.
    *  4. MAXIMALITY: right-maximal by construction (span_len is the
    *     position's own maximum); left-maximal via one self-join —
    *     extendable-left ⟺ maxdup(pos−1) ≥ span_len+1, and a non-seed
    *     pos−1 has maxdup < minLen ≤ span_len, so seeds suffice.
    *
    * Gram identity is the [[graft.plans.TokenWindowHash64]] chained
    * token-hash family (per-token XXH64 once, then a length-long chain
    * — natively codegen'd, and incremental in length for the resolve's
    * [[graft.plans.LadderWindowHash]]; r18, was xxhash64 of the joined
    * window text built per candidate in interpreted lambdas) — hash
    * CHOICE is free here because the oracle is an independent algorithm
    * (suffix sort + neighbor LCP), not a hash mirror, and grams never
    * escape the plan; equal-gram semantics assume no 64-bit collisions,
    * the same corpus-scale argument [[duplicatedSpans]] documents. Token arrays live ONE ROW
    * PER DOC throughout: candidate positions travel as per-doc INT
    * ARRAYS, each round joins them back to the cached (doc, toks) frame
    * at doc grain (a few MB — broadcast-sized beside any corpus), and
    * grams hash inside a `transform` lambda, so the shuffles move only
    * (hash, doc, pos) rows — the first cut shipped the whole token
    * array once per POSITION through every exchange and measured 10×
    * slower. `maxRounds` bounds detectable span length at
    * minLen·2^maxRounds tokens (default 8·2^16 ≈ 524k — longer true
    * spans would report truncated); the ladder also self-terminates at
    * the longest document, so real round counts are
    * ~log2(maxDocLen/minLen). */
  def maximalDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                             minLen: Int = 8, maxRounds: Int = 16): DataFrame =
    maximalSpansFromToks(
      tracked(docs.select(col(idCol).as("doc"),
        Text.tokens(lower(col(textCol))).as("toks"))),
      minLen, maxRounds)

  /** Ladder body over a PRE-TOKENIZED (doc, toks) frame the caller has
    * already tracked/persisted — [[removeMaximalSpans]] shares one
    * tokenize pass between the ladder and its reassembly join instead of
    * tokenizing the corpus twice (r18). `toksAll` must be cached: every
    * ladder round, the resolve and the span-text join re-read it. */
  private[graft] def maximalSpansFromToks(toksAll: DataFrame,
                                          minLen: Int,
                                          maxRounds: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // one row per doc; filters the caller's cached frame (short docs
    // cannot seed), so each consumer pays a cached scan + filter, not a
    // second corpus tokenize
    val toksF = toksAll.filter(size(col("toks")) >= minLen)
    // survivors of a probe at `len` among the (doc, positions[]) frame —
    // exactness argument per round: step 2 of the class doc. Output is
    // re-packed to per-doc arrays for the next round's doc-grain join
    // (the survivor side is seed-sized, so Catalyst broadcasts it and
    // the cached token frame streams map-side). The SEED round needs no
    // join at all: every position probes, so its hashes come straight
    // off the token frame ([[graft.plans.TokenWindowHash64]], index =
    // position). Ladder rounds hash only the survivors' positions
    // ([[graft.plans.PosWindowHash]] — native, rem-filter built in;
    // replaces the interpreted transform(filter(...), xxhash64(
    // concat_ws(slice))) chain that built a len-token string per
    // candidate; gram VALUES change with the hash family, which the
    // class doc already adjudicates as free — the oracle is an
    // independent suffix sort and grams never escape the plan).
    // Duplication test is a count over a hash-partitioned WINDOW — one
    // exchange — not aggregate-then-semi-join (two exchanges of the
    // same rows; the profile had the ladder paying both per round).
    val wG = Window.partitionBy(col("g"))
    def dupWithin(posA: Option[DataFrame], len: Int): DataFrame =
      posA.fold(
          toksF.select(col("doc"), posexplode(
            graft.plans.TokenWindowHash64.tokenWindowHash(col("toks"), len)))
            .select(col("doc"), col("pos"), col("col").as("g")))(
          pa => toksF.join(pa, Seq("doc"))
            .select(col("doc"), explode(
              graft.plans.PosWindowHash.at(col("toks"), col("ps"), len))
              .as("pg"))
            .select(col("doc"), col("pg.pos").as("pos"), col("pg.g").as("g")))
        .withColumn("n", count(lit(1)).over(wG))
        .filter(col("n") >= 2)
        .groupBy(col("doc")).agg(collect_list(col("pos")).as("ps"))
    var active = tracked(dupWithin(None, minLen))
    var tracked_ = List(active)
    var levels = List(active.withColumn("lo", lit(minLen)))
    var lo = minLen
    var rounds = 0
    var n = active.count()
    // the longest doc bounds every span — probing past it schedules a
    // provably-empty round's worth of jobs (measured 1.7 s of overhead)
    val maxRem =
      if (n == 0) 0L
      else toksF.agg(max(size(col("toks")))).collect()(0).getInt(0).toLong
    while (n > 0 && rounds < maxRounds && lo * 2L <= maxRem) {
      rounds += 1
      val next = tracked(dupWithin(Some(active), lo * 2))
      tracked_ ::= next
      n = next.count()
      if (n > 0) {
        levels ::= next.withColumn("lo", lit(lo * 2))
        active = next
        lo *= 2
      }
    }
    // truncation is a FLAG, not a silent cap (r17 ADVICE): a corpus
    // whose spans outrun minLen·2^maxRounds would report them truncated
    // and diverge from a suffix-array oracle — say so when it is the
    // ROUND bound (not the longest document) that stopped the ladder
    if (rounds == maxRounds && n > 0 && lo * 2L <= maxRem)
      System.err.println(s"[graft] maximalDuplicatedSpans: ladder stopped " +
        s"by maxRounds=$maxRounds at probe length $lo — spans longer than " +
        s"${lo * 2} tokens (if any) will report truncated; raise maxRounds")
    // per-seed bracket lo (deepest survived level), re-packed per doc —
    // one aggregate over the level frames, no per-round anti-joins
    val seeds = levels.map(_.select(col("doc"), col("lo"),
        explode(col("ps")).as("pos")))
      .reduce(_ unionByName _)
      .groupBy(col("doc"), col("pos")).agg(max(col("lo")).as("lo"))
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("pos"), col("lo"))).as("qs"))
    // RESOLVE: per doc, (pos, p, gram) rows for every p in [minLen, hi)
    // of every seed — in-row off the one toks row via the native
    // [[graft.plans.LadderWindowHash]] kernel, whose chained hash is
    // INCREMENTAL in p: all of a seed's lengths cost one O(hi) chain
    // where the old per-length transform re-hashed each prefix
    // independently (O(hi²) per seed — the profile's two most expensive
    // stages, 19.3 s + 9.8 s task time at sf0.1, were the two sides of
    // this stage). The same one-exchange window count decides
    // duplication, and maxdup is TRACKED because the left-maximality
    // self-join below reads it twice.
    val wPG = Window.partitionBy(col("p"), col("g"))
    val maxdup = tracked(toksF.join(seeds, Seq("doc"))
      .select(col("doc"), explode(
        graft.plans.LadderWindowHash.at(col("toks"), col("qs"), minLen))
        .as("row"))
      .select(col("doc"), col("row.pos").as("pos"), col("row.p").as("p"),
        col("row.g").as("g"))
      .withColumn("n", count(lit(1)).over(wPG))
      .filter(col("n") >= 2)
      .groupBy(col("doc"), col("pos"))
      .agg(max(col("p")).cast("long").as("span_len")))
    // materialize the resolve HERE, then release the superseded ladder
    // level frames (r17 ADVICE): the levels only feed `seeds`, which the
    // resolve above has now consumed — without this, a library caller
    // outside the bench loop accumulates up to maxRounds cached frames
    // per invocation until its own unpersistAll. toksF and maxdup stay
    // cached (the maximality join and the span text read them); both
    // release with the "dedup" scope as before.
    maxdup.count()
    tracked_.foreach(_.unpersist(false))
    val prev = maxdup.select(col("doc"), (col("pos") + 1).as("pos"),
      col("span_len").as("prev_len"))
    maxdup.join(prev, Seq("doc", "pos"), "left")
      .filter(col("prev_len").isNull || col("prev_len") < col("span_len") + 1)
      .join(toksF, Seq("doc"))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("span_len"),
        concat_ws(" ", slice(col("toks"), col("pos") + 1,
          col("span_len").cast("int"))).as("span"))
  }

  /** MAXIMAL-span REMOVAL — the end-to-end Lee et al. (2022) dedup
    * pipeline: [[maximalDuplicatedSpans]]' exact any-length span report
    * composed with [[removeDuplicatedSpans]]' canonical-owner scrubbing,
    * so the corpus dedups at MAXIMAL span grain instead of fixed-w
    * windows. Each reported maximal span (grouped by its exact text)
    * keeps its tokens only at the CANONICAL occurrence — the minimum
    * (doc, pos) site, so within one doc the FIRST of two repeats
    * survives — and every other reported occurrence loses the covered
    * tokens. Unique prose, and documents too short to seed, pass through
    * verbatim.
    *
    * Grain note, deliberate: the unit of removal is a REPORTED maximal
    * occurrence. An occurrence embedded in a strictly LONGER duplicated
    * context at some site is governed by that site's enclosing span row
    * (the embedded copy is not separately reported there — it is not
    * left-maximal), so a doc whose span's only other occurrences are
    * embedded keeps its copy: it is that exact span's first free-
    * standing site. The DuckDB oracle derives the same set from the
    * independent suffix-sort algorithm, so the semantics are pinned
    * cross-engine, not an artifact of the ladder.
    *
    * Scale shape: everything past the ladder is span-OUTPUT-bounded —
    * group occurrences by an 8-byte hash of the span text (never
    * shuffling the text itself beyond each row's own span column), one
    * min-struct aggregate for the canonical site, one hash-keyed join
    * back, in-row interval union + token filtering (the
    * [[removeDuplicatedSpans]] reassembly). Output per input doc:
    * (doc, n_tokens, n_removed, clean_text). */
  def removeMaximalSpans(docs: DataFrame, idCol: String, textCol: String,
                         minLen: Int = 8, maxRounds: Int = 16): DataFrame = {
    // ONE tokenize pass, cached, shared by the ladder AND the
    // reassembly join below (r18 — was two full-corpus tokenizes)
    val toksAll = tracked(docs.select(col(idCol).as("doc"),
      Text.tokens(lower(col(textCol))).as("toks")))
    // tracked: the canonical-site aggregate AND the removal join both
    // read this frame — without the persist the ladder's whole
    // span-report tail (left-maximality self-join + per-row span-text
    // slice) evaluates once per consumer.
    // Span-occurrence-bounded, so the cache is small by construction.
    val spans = tracked(maximalSpansFromToks(toksAll, minLen, maxRounds)
      // span_len disambiguates the (astronomically unlikely) text-equal
      // prefix hash case for free — both columns are already in-row
      .withColumn("g", xxhash64(col("span_len"), col("span"))))
    val canon = spans.groupBy(col("g"))
      .agg(min(struct(col("doc"), col("pos"))).as("c"))
    val removed = spans.join(canon, Seq("g"))
      .filter(col("doc") =!= col("c.doc") || col("pos") =!= col("c.pos"))
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("pos").cast("int").as("pos"),
        col("span_len").cast("int").as("len"))).as("ivs"))
      .select(col("doc"), array_distinct(flatten(transform(col("ivs"),
        iv => sequence(iv.getField("pos"),
          iv.getField("pos") + iv.getField("len") - 1)))).as("rem"))
    toksAll.join(removed, Seq("doc"), "left")
      .select(col("doc"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(size(col("rem")), lit(0)).cast("long").as("n_removed"),
        // native one-pass reassembly (r19, verdict ask #4): the old
        // interpreted filter probed `rem` per token — O(len × |rem|)
        // per doc, hostile at 100 TB docs with many spans (SpanScrub)
        graft.plans.JoinTokensExcept.joinExcept(col("toks"), col("rem"))
          .as("clean_text"))
  }

  /** Cross-document LINE dedup (CCNet-style boilerplate removal, Wenzek
    * et al. 2020, arXiv:1911.00359 §3.1 line-level deduplication): a line
    * whose normalized form appears in MORE THAN `maxDf` distinct documents
    * is template furniture — navigation menus, cookie banners, copyright
    * footers — and is removed from EVERY document (no canonical copy
    * survives, unlike [[removeDuplicatedSpans]], which keeps one owner of
    * each syndicated passage: boilerplate is noise in every position it
    * occupies, a quoted passage is content in exactly one).
    *
    * Line identity is the md5 of the whitespace-collapsed, trimmed,
    * lowercased line — one deterministic normalization any engine
    * reproduces, and a 32-hex-char shuffle key regardless of line length.
    * Lines whose normalized form is shorter than `minLineChars` (blank
    * lines by default) never count toward df and are never removed.
    *
    * Output per input doc: (doc, n_lines, n_removed, clean_text) where
    * `clean_text` keeps the surviving lines VERBATIM (original case and
    * inner spacing) in original order, joined with `\n`.
    *
    * Scale shape (mirrors [[removeDuplicatedSpans]]):
    *  - the df census shuffles (fp, doc) pairs once — fp is the fixed-width
    *    md5, never the line text;
    *  - the removal join carries only boilerplate OCCURRENCES back
    *    ((doc, pos) pairs, df-capped by nothing because boilerplate rows
    *    are the operator's OUTPUT budget: a line in ten thousand docs
    *    contributes ten thousand (doc, pos) longs, not ten thousand
    *    copies of its text), aggregated to one positions array per doc;
    *  - reassembly is in-row: the original doc splits once and filters
    *    by position. Full text stays out of every exchange AS LONG AS
    *    the per-doc removal frame broadcasts (PlanAuditSpec pins that
    *    on the test corpus); a corpus where most docs carry boilerplate
    *    makes that side O(docs) and the reassembly join degrades to a
    *    shuffle of the base — still one exchange, never quadratic. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             maxDf: Int = 9,
                             minLineChars: Int = 1): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1 (df > maxDf is removed)")
    val base = docs.select(col(idCol).as("doc"),
      split(col(textCol), "\n", -1).as("ls"))
    val lines = base.select(col("doc"), posexplode(col("ls")))
      .select(col("doc"), col("pos"),
        md5(lower(trim(regexp_replace(col("col"), "\\s+", " ")))).as("fp"),
        length(trim(regexp_replace(col("col"), "\\s+", " "))).as("nfp"))
    // Census over participating lines only. Sub-minLineChars lines never
    // enter, so their fps cannot reach the boilerplate set — the removal
    // join below needs no second length guard.
    val bp = lines.filter(col("nfp") >= minLineChars)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc")).as("df"))
      .filter(col("df") > maxDf)
      .select("fp")
    val rem = lines.join(bp, Seq("fp"))
      .groupBy(col("doc"))
      .agg(collect_list(col("pos")).as("rem"))
    base.join(rem, Seq("doc"), "left")
      .select(col("doc"),
        size(col("ls")).cast("long").as("n_lines"),
        coalesce(size(col("rem")), lit(0)).cast("long").as("n_removed"),
        // native one-pass reassembly (r19) — SpanScrub scaladoc
        graft.plans.JoinTokensExcept.joinExcept(col("ls"), col("rem"), "\n")
          .as("clean_text"))
  }

  /** Exact PARAGRAPH dedup with a first-occurrence canonical — the
    * sub-document granularity between [[removeBoilerplateLines]] (df-
    * capped, NO survivor: template furniture) and [[exactGroups]] (whole
    * documents): every repeated paragraph keeps exactly its GLOBAL FIRST
    * occurrence (minimum (doc, pos), the deterministic arrival-order
    * canonical) and loses all later ones — including repeats inside one
    * document — regardless of how many documents carry it. This is the
    * paragraph-level pass of CCNet-style pipelines: syndicated passages,
    * quoted headers, and copy-pasted blocks collapse to one owner while
    * each document keeps its unique prose.
    *
    * Paragraph identity = md5 of the whitespace-collapsed, trimmed,
    * lowercased paragraph (the [[removeBoilerplateLines]] normalization);
    * paragraphs under `minChars` normalized chars (blanks) are exempt.
    *
    * Output per input doc: (doc, n_paras, n_removed, clean_text) with
    * surviving paragraphs VERBATIM in original order.
    *
    * Scale shape: the canonical needs only the GLOBAL MIN (doc, pos) per
    * fp, so occurrences collapse through a size-1 heap aggregate
    * ([[Ranking.keepSmallestK]], hash-based; the occurrence rows are the
    * thin (fp, doc, pos) projection that contract asks for) — partial
    * mins fold a viral paragraph's millions of occurrences map-side with
    * NO sort, where the obvious per-fp `row_number` window would land
    * them all in ONE task's sort (the skew hazard
    * [[removeBoilerplateLines]] avoids with its df census). The trade
    * against the old single window: `occ` is consumed TWICE (the
    * canonical aggregate and the removal join-back), so the map-only
    * split/posexplode/md5 tokenize subtree runs two passes — deliberate
    * and unpersisted, because caching a row-exploded map-only frame
    * measured ~25% SLOWER than recomputing it (the r11 Familiarity/DSIR
    * A/B/A; the [[Caches]] rule persists only recompute that crosses an
    * exchange, and this one doesn't). The canonical
    * set joins back on the fp (32-hex, never the paragraph text); the
    * removal join carries (doc, pos) longs at duplicate-occurrence
    * cardinality; reassembly is in-row on the original doc's split
    * array. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
                      minChars: Int = 1): DataFrame = {
    val base = docs.select(col(idCol).as("doc"),
      split(col(textCol), "\n", -1).as("ls"))
    val paras = base.select(col("doc"), posexplode(col("ls")))
      .select(col("doc"), col("pos"),
        md5(lower(trim(regexp_replace(col("col"), "\\s+", " ")))).as("fp"),
        length(trim(regexp_replace(col("col"), "\\s+", " "))).as("nfp"))
    val occ = paras.filter(col("nfp") >= minChars)
    // size-1 heap, not min(struct): the declarative min over a struct
    // buffer falls back to SortAggregate (per-partition sorts by fp);
    // the ObjectHashAggregate heap keeps the map-combinable collapse
    // with no sort at all
    val first = Ranking.keepSmallestK(
        occ.select(col("fp"), col("doc"), col("pos")), "fp",
        Seq(col("doc"), col("pos")), 1)
      .select(col("fp"), struct(col("doc"), col("pos")).as("keep"))
    val rem = occ.join(first, Seq("fp"))
      .filter(struct(col("doc"), col("pos")) =!= col("keep"))
      .groupBy(col("doc")).agg(collect_list(col("pos")).as("rem"))
    base.join(rem, Seq("doc"), "left")
      .select(col("doc"),
        size(col("ls")).cast("long").as("n_paras"),
        coalesce(size(col("rem")), lit(0)).cast("long").as("n_removed"),
        // native one-pass reassembly (r19) — SpanScrub scaladoc
        graft.plans.JoinTokensExcept.joinExcept(col("ls"), col("rem"), "\n")
          .as("clean_text"))
  }

  /** Snapshot DIFF between two corpus versions keyed by document id —
    * the recrawl delta a 100 TB pipeline feeds its incremental stages
    * instead of reprocessing the world: `added` (id only in the new
    * snapshot), `removed` (only in the old), `changed` (both, different
    * content fingerprint). Unchanged documents are NOT emitted — the
    * output is delta-cardinality, which is the entire point.
    *
    * Content identity is the RAW md5 (no normalization): the diff
    * detects byte changes; semantic-equivalence questions belong to the
    * dedup operators downstream.
    *
    * Scale shape: each side reduces map-only to (id, 32-hex fp) — text
    * never crosses an exchange — and the full-outer join shuffles those
    * thin pairs on the id; with both snapshots bucketed by id the join
    * is exchange-free. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc"), md5(col(textCol)).as("old_fp"))
    val n = newDocs.select(col(idCol).as("doc"), md5(col(textCol)).as("new_fp"))
    o.join(n, Seq("doc"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc"), col("status"), col("old_fp"), col("new_fp"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup via
    * clustering: k-means the embedding space, then search for near-dup
    * pairs only WITHIN each cluster. The published scale path for
    * embedding-level dedup of web corpora: within-cluster pairing costs
    * O(n²/k) vs the exact path's O(n²), and the cluster id carries the
    * semantic locality that [[embeddingNearDupsLsh]]'s hyperplane buckets
    * approximate statistically.
    *
    * Scale shape:
    *  - clustering is [[Ivf.build]]: deterministic seeds (k lowest ids),
    *    exact fixed-point centroid updates (byte-reproducible under any
    *    partitioning/AQE re-plan), broadcast centroids, map-only
    *    assignment — the corpus itself never shuffles for the build;
    *  - the corpus shuffles ONCE on `centroid_id` for the cluster-local
    *    self-join; the truncation window and both join sides reuse that
    *    same partitioning, so one exchange total;
    *  - clusters are truncated to their `maxCluster` LOWEST ids
    *    (deterministic) — unlike [[capBuckets]]' drop-the-bucket rule,
    *    because a large cluster is legitimate semantic mass, not an
    *    exact-dup flood; truncation bounds the worst cluster at
    *    O(maxCluster²) instead of silently deleting it;
    *  - scoring is the native codegen [[graft.plans.CosineSimilarity]].
    *
    * Every step is deterministic and engine-portable (seeded init, exact
    * integer centroid sums, IEEE-identical cosine fold), so the WHOLE
    * pipeline — Lloyd update included — sits under the DuckDB oracle
    * (`q_dedup_semantic` mirrors seeds → assign → fixed-point update →
    * reassign → truncate → in-cluster pairs), unlike the seeded-LSH
    * families that need portable twins. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, k: Int = 64, iters: Int = 1,
                    maxCluster: Int = 4096, roundTo: Int = 5): DataFrame = {
    import graft.plans.CosineSimilarity.cosineSim
    val (assignments, _) = Ivf.build(emb, idCol, vecCol, k, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id")).orderBy(col("vid"))
    // assignments already carries (vid, vec, centroid_id) map-only — no
    // corpus re-join; the window below is the build's ONE corpus shuffle
    val clustered = tracked(assignments
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxCluster)
      .drop("rn"))
    val a = clustered.select(col("centroid_id"),
      col("vid").as("id_a"), col("vec").as("vec_a"))
    val b = clustered.select(col("centroid_id"),
      col("vid").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosineSim(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("cosine") >= threshold)
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("id_a"), col("id_b"), col("cosine"))
  }
}
