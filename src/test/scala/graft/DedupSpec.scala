package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "a completely different document about spark query engines at scale",
    3L -> "yet another unrelated text mentioning neither foxes nor engines here")

  /** doc 101 = near-dup of doc 1 (one word changed); doc 102 = exact dup
    * of doc 2; doc 103 = exact dup of doc 3 modulo whitespace/case. */
  private val corpus = (base ++ Seq(
    101L -> "the quick brown fox jumps over the lazy cat again and again today",
    102L -> "a completely different document about spark query engines at scale",
    103L -> "A  Completely Different   Document About Spark Query Engines At Scale"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts only") {
    val groups = Dedup.exactGroups(corpus, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("canonical_id") == 2L)
    assert(groups.head.getAs[Long]("n_copies") == 2L)
  }

  test("normalized dedup also folds whitespace/case variants") {
    val groups = Dedup.normalizedGroups(corpus, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_copies") == 3L) // 2, 102, 103
  }

  test("portable minhash: exact duplicates agree on every hash family") {
    val pairs = Dedup.minhashNearDupsPortable(corpus, "doc_id", "text",
      numHashes = 16, bands = 8, shingleN = 3, minEstJaccard = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    // 2 and 102 are byte-identical → identical signatures → estimate 1.0
    assert(pairs((2L, 102L)) == 1.0)
    // near-dup 1 vs 101 must be found with a sub-1.0 estimate
    assert(pairs.contains((1L, 101L)) && pairs((1L, 101L)) < 1.0)
  }

  test("unpersistIntermediates releases every tracked cached block") {
    spark.catalog.clearCache()
    Dedup.unpersistIntermediates() // drain leftovers from other tests
    // minhashNearDups persists signatures + capped buckets internally
    Dedup.minhashNearDups(corpus, "doc_id", "text",
      numHashes = 16, bands = 8, shingleN = 3, minEstJaccard = 0.3).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Dedup.unpersistIntermediates()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("incremental dedup drops store dups and within-batch copies") {
    val store = Seq("already kept text").toDF("text")
      .select(md5(col("text")).as("fingerprint"))
    val batch = Seq(
      (1L, "already kept text"),      // dup vs store → dropped
      (2L, "a brand new document"),   // new → kept
      (3L, "a brand new document"),   // within-batch dup → dropped (2 wins)
      (4L, "another new one"))        // new → kept
      .toDF("doc_id", "text")
    val kept = Dedup.newAgainstStore(batch, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("in-row native minhash signatures == shuffled groupBy form") {
    // the zero-shuffle MinHashSig path must be bit-equal to the exploded
    // distinct+groupBy formulation it replaced (min is duplicate-insensitive)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc") -> r.getSeq[Long](1).toList).toMap
    val fast = collect(Dedup.minhashSignatures(corpus, "doc_id", "text",
      numHashes = 32, shingleN = 3))
    val ref = collect(Dedup.minhashSignaturesShuffled(corpus, "doc_id", "text",
      numHashes = 32, shingleN = 3))
    assert(fast == ref)
    assert(fast.size == corpus.count())
  }

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, shingleN = 3, minEstJaccard = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 101L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 2L) })
  }

  test("minhash candidates: ids-only pair dedup == sig-carrying reference") {
    // The production path distincts candidate pairs on ids alone and
    // rejoins signatures afterwards (narrow shuffle); this reference
    // carries both signatures through the distinct, the shape it replaced.
    // Results must be identical, pair for pair and estimate for estimate.
    val numHashes = 32; val bands = 8; val rows = numHashes / bands
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text",
      numHashes = numHashes, shingleN = 3)
    val fast = Dedup.minhashCandidates(sigs, numHashes, bands)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    val banded = sigs.select(col("doc"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc").as("doc_b"), col("sig").as("sig_b"))
    val ref = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(numHashes).cast("double"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(fast == ref)
    assert(fast.nonEmpty)
  }

  test("portable simhash: identical token streams collide at hamming 0") {
    val pairs = Dedup.simhashNearDupsPortable(corpus, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    // byte-identical text and the ws/case variant both tokenize to the
    // same stream under lower+split → identical signatures
    assert(pairs((2L, 102L)) == 0L)
    assert(pairs((2L, 103L)) == 0L)
    assert(pairs((102L, 103L)) == 0L)
    // unrelated docs never collide within hamming 3
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((1L, 3L)))
  }

  test("native single-pass simhash == 64-fold composable form") {
    val native = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composable = Dedup.simhashComposable(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composable)
    assert(native.nonEmpty)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sigs = Dedup.simhash(corpus, "doc_id", "text")
    val byDoc = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(byDoc(1L), byDoc(101L)) < hamming(byDoc(1L), byDoc(2L)))
    assert(byDoc(2L) == byDoc(102L)) // identical text → identical signature
  }

  test("simhash banding caps degenerate hot buckets") {
    // 40 identical docs: every signature equal → one bucket per chunk
    // holding all 40. Uncapped that is 4 × C(40,2) joined rows; with
    // maxBucket below 40 the flood is dropped entirely (exact dedup's job),
    // while a genuine small near-dup bucket still comes through.
    val flood = (1L to 40L).map(i => i -> "all these documents are exactly identical to each other")
    val sigs = Dedup.simhash((flood :+ (900L ->
      "all these documents are exactly identical to each others")).toDF("doc_id", "text"),
      "doc_id", "text")
    val capped = Dedup.simhashNearDups(sigs, maxHamming = 3, maxBucket = 16).collect()
    assert(capped.isEmpty) // every bucket overflows: bounded, not quadratic
    val uncapped = Dedup.simhashNearDups(sigs, maxHamming = 3, maxBucket = 64)
      .collect()
    assert(uncapped.length >= 40 * 39 / 2) // cap is the only thing bounding it
  }

  test("embedding LSH near-dups match the exact path on planted pairs") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val planted = emb.map { case (i, v) => (i + 1000L, v.map(_ * 1.5f)) }
    val corpus = (emb ++ planted).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupsLsh(corpus, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // collinear planted pairs are in every LSH table's bucket: recall 1
    emb.foreach { case (i, _) => assert(lsh.contains((i, i + 1000L))) }
    assert(lsh == exact) // precision too: cosine scoring is exact
  }

  test("embedding LSH plan has no nested-loop join and no corpus broadcast") {
    val corpus = (1L to 30L).map(i =>
      (i, Array.fill(8)(((i * 31 + 7) % 13).toFloat - 6f))).toDF("vec_id", "embedding")
    val plan = Dedup.embeddingNearDupsLsh(corpus, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("connected components propagate min labels across multi-hop chains") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val comps = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(comps(20L) == 20L && comps(21L) == 20L)
  }

  test("components equal driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 120).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val got = Dedup.components(edges.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same node universe, and min-label == union-find root everywhere
    assert(got.keySet == expected.keySet)
    got.foreach { case (n, c) => assert(c == expected(n), s"node $n") }
  }

  test("keepCanonical retains unpaired docs and one doc per component") {
    val docs = (1L to 6L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 6L)) // 2 and 5 fold into component 1
  }

  test("exact n-gram jaccard reports exact overlap for candidates") {
    val pairs = Dedup.jaccardNearDups(corpus, "doc_id", "text",
      shingleN = 3, dfMax = 10, minJaccard = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSeq
    val planted = pairs.find(p => p._1 == 1L && p._2 == 101L)
    assert(planted.isDefined)
    // 13 tokens → 11 3-shingles each; one word changed at position 9 kills
    // exactly 3 shingles: |A∩B| = 8, |A∪B| = 14 → 4/7.
    assert(math.abs(planted.get._3 - 8.0 / 14.0) < 1e-12)
  }

  test("containment finds subset duplication that jaccard misses") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (5 to 16).map(i => s"w$i").mkString(" ") // 12 tokens inside big
    val docs = Seq((1L, big), (2L, excerpt),
      (3L, "unrelated words that never appear anywhere else at all"))
      .toDF("doc_id", "text")
    // excerpt: 12 tokens → 8 5-shingles, ALL inside big (56 shingles):
    // containment 8/8 = 1.0
    val cont = Dedup.containmentNearDups(docs, "doc_id", "text",
      shingleN = 5, dfMax = 50, minContainment = 0.9)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_common"), r.getAs[Double]("containment"))).toSeq
    assert(cont == Seq((1L, 2L, 8L, 1.0)))
    // symmetric jaccard of the same pair: 8/(56+8-8) ≈ 0.14 — invisible
    // to any useful jaccard threshold
    val jac = Dedup.jaccardNearDups(docs, "doc_id", "text",
      shingleN = 5, dfMax = 50, minJaccard = 0.3).collect()
    assert(jac.isEmpty)
  }

  test("jaccard length-ratio prefilter loses no qualifying pair (boundary-exact)") {
    // doc 11 (3 shingles) ⊂ doc 12 (10 shingles): J = 3/10 = minJaccard
    // EXACTLY — the prefilter ratio min/max = 3/10 must keep it (>=, not >).
    // doc 13 is a 30-shingle superset of 11: ratio 3/30 < 0.3 → prefiltered,
    // and brute force agrees J < 0.3 (no false negative).
    val docs = Seq(
      (11L, "a b c d e"),
      (12L, "a b c d e f g h i j k l"),
      (13L, ("a b c d e" +: (1 to 27).map(i => s"w$i")).mkString(" ")),
      (14L, "totally different words here now friend")).toDF("doc_id", "text")
    def shingleSet(s: String) =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = Map(11L -> "a b c d e", 12L -> "a b c d e f g h i j k l",
      13L -> ("a b c d e" +: (1 to 27).map(i => s"w$i")).mkString(" "),
      14L -> "totally different words here now friend")
    val brute = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = shingleSet(texts(a)); sb = shingleSet(texts(b))
      j = (sa & sb).size.toDouble / (sa | sb).size.toDouble if j >= 0.3
    } yield (a, b, j)).toSet
    val got = Dedup.jaccardNearDups(docs, "doc_id", "text",
      shingleN = 3, dfMax = 100, minJaccard = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got == brute, s"got $got expected $brute")
    assert(got.contains((11L, 12L, 0.3))) // the boundary pair survived
  }

  test("jaccard stage counts match the hand-computed candidate funnel") {
    // 1-shingles: d1={a,b,c} d2={a,b,d} d3={a,e,f}, all size 3.
    // dfs: a=3 b=2 c=d=e=f=1 → banded [2,20] = {a,b}.
    // index_rows = 9; banded rows = a:3 + b:2 = 5;
    // Σ C(df,2) = C(3,2)+C(2,2) = 4; all sizes equal ⇒ ratio keeps all 4
    // per-shingle ordered pairs; distinct pairs = {12,13,23} = 3.
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "a e f"))
      .toDF("doc_id", "text")
    val counts = Dedup.jaccardStageCounts(docs, "doc_id", "text",
      shingleN = 1, dfMax = 20, minJaccard = 0.5)
    assert(counts == Map(
      "index_rows" -> 9L, "banded_index_rows" -> 5L,
      "enumerated_pairs" -> 4L, "ratio_kept_pairs" -> 4L,
      "distinct_pairs" -> 3L), counts.toString)
    // the pre-flight estimate is the measured enumeration, by construction
    assert(Dedup.candidateVolumeEstimate(docs, "doc_id", "text",
      shingleN = 1, dfMax = 20) == counts("enumerated_pairs"))
    // the optional guard trips BEFORE any pair materializes…
    val e = intercept[IllegalStateException](
      Dedup.jaccardNearDups(docs, "doc_id", "text", shingleN = 1, dfMax = 20,
        minJaccard = 0.5, maxCandidatePairs = Some(3L)))
    assert(e.getMessage.contains("4 pairs"))
    // …and a sufficient budget passes through with identical results
    assert(Dedup.jaccardNearDups(docs, "doc_id", "text", shingleN = 1,
      dfMax = 20, minJaccard = 0.5, maxCandidatePairs = Some(4L)).count() ==
      Dedup.jaccardNearDups(docs, "doc_id", "text", shingleN = 1,
        dfMax = 20, minJaccard = 0.5).count())
  }

  test("incremental minhash: store near-dups rejected, batch components collapse, history untouched") {
    def sent(ws: Seq[String]) = ws.mkString(" ")
    val storeWords = (1 to 20).map(i => s"stored$i")
    val batchWords = (1 to 20).map(i => s"fresh$i")
    val store = Seq((10L, sent(storeWords))).toDF("doc_id", "text")
    val batch = Seq(
      (21L, sent(batchWords)),               // genuinely new → kept
      (22L, sent(storeWords.dropRight(1))),  // near-copy of store 10 → dropped
      (23L, sent(batchWords.dropRight(1))),  // near-copy of 21 → collapses to 21
      (24L, sent((1 to 20).map(i => s"other$i")))) // new → kept
      .toDF("doc_id", "text")
    val storeSigs = Dedup.minhashSignaturesPortable(store, "doc_id", "text")
    val kept = Dedup.newAgainstStoreMinhash(batch, "doc_id", "text", storeSigs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(21L, 24L), kept.toString)
    // the same batch against an empty store keeps the within-batch policy
    val kept2 = Dedup.newAgainstStoreMinhash(batch, "doc_id", "text",
        storeSigs.limit(0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(21L, 22L, 24L), kept2.toString)
    // a caller-persisted pre-banded STRING-key store keeps its keys (no
    // long-folding that would break bucket co-location) and produces the
    // identical keep set
    val kept3 = Dedup.newAgainstStoreMinhash(batch, "doc_id", "text",
        storeSigs, storeBanded = Some(Dedup.bandedPortable(storeSigs, 16, 8)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept3 == kept, kept3.toString)
  }

  test("incremental minhash: xxhash64 fast family keeps the same set as the portable md5 family") {
    // Planted corpus with unambiguous near-dup structure (estimates sit
    // far from the 0.3 threshold on both families): the keep set must be
    // hash-family-invariant — this equality is how the fast scale path
    // inherits the portable twin's oracle anchoring.
    def sent(p: String, n: Int = 25) = (1 to n).map(i => s"$p$i").mkString(" ")
    def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")
    val store = Seq((10L, sent("kept")), (11L, sent("held")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (21L, sent("fresh")),             // new → kept
      (22L, dropLast(sent("kept"))),    // store near-dup → dropped
      (23L, dropLast(sent("fresh"))),   // batch near-dup → collapses to 21
      (24L, dropLast(sent("held"))),    // store near-dup → dropped
      (25L, sent("other")))             // new → kept
      .toDF("doc_id", "text")
    val keptPortable = Dedup.newAgainstStoreMinhash(batch, "doc_id", "text",
        Dedup.minhashSignaturesPortable(store, "doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFast = Dedup.newAgainstStoreMinhashFast(batch, "doc_id", "text",
        Dedup.minhashSignatures(store, "doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptPortable == Set(21L, 25L), keptPortable.toString)
    assert(keptFast == keptPortable, s"fast=$keptFast portable=$keptPortable")
  }

  test("bloom-prefiltered incremental dedup equals the plain store anti-join") {
    // the sketch must change the plan, never the answer: no false
    // negatives, maybes confirmed exactly — result sets identical
    val docs = (1L to 60L).map(i => (i, s"document body ${i % 20} tail"))
      .toDF("doc_id", "text")
    val store = docs.filter($"doc_id" % 2 === 0)
      .select(org.apache.spark.sql.functions.md5($"text").as("fingerprint"))
    val batch = docs.unionByName(
      docs.select(($"doc_id" + 1000L).as("doc_id"), $"text"))
    val plain = Dedup.newAgainstStore(batch, "doc_id", "text", store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // tiny sketch (high collision pressure) still exact; generous sketch too
    for (items <- Seq(8L, 4096L)) {
      val bloom = Dedup.newAgainstStoreBloom(batch, "doc_id", "text", store,
        expectedItems = items, fpp = 0.05)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloom == plain, s"items=$items: $bloom vs $plain")
    }
    // empty store: null sketch short-circuits, within-batch policy intact
    val emptyStore = store.limit(0)
    val bloomEmpty = Dedup.newAgainstStoreBloom(batch, "doc_id", "text",
      emptyStore, expectedItems = 64L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plainEmpty = Dedup.newAgainstStore(batch, "doc_id", "text", emptyStore)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomEmpty == plainEmpty)
  }

  test("ingestion core refuses a pair-shaped output over folded band keys at construction") {
    // The 64-bit band-key fold is keep-set-only: a key collision creates
    // spurious bucket co-residency the est-Jaccard filter absorbs for
    // keeps but would emit as a phantom pair. The contract is enforced by
    // a require on the shared core — a future pair-shaped caller fails
    // here by name, not as an opaque oracle mismatch rounds later.
    def sent(p: String) = (1 to 25).map(i => s"$p$i").mkString(" ")
    val store = Seq((10L, sent("kept"))).toDF("doc_id", "text")
    val batch = Seq((21L, sent("fresh"))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.newAgainstStoreCore(batch, "doc_id", "text",
        Dedup.minhashSignaturesPortable(store, "doc_id", "text"),
        numHashes = 16, bands = 8, minEstJaccard = 0.3, storeBanded = None,
        signatures = d => Dedup.minhashSignaturesPortable(d, "doc_id", "text"),
        banding = s => Dedup.bandedPortable(s, 16, 8),
        output = Dedup.IngestPairs)
    }
    assert(e.getMessage.contains("keep-set-only"), e.getMessage)
    // with native (string) band keys preserved, the pair shape is merely
    // unimplemented — it must still fail by name, not emit folded pairs
    val sigs = Dedup.minhashSignaturesPortable(store, "doc_id", "text")
    val e2 = intercept[UnsupportedOperationException] {
      Dedup.newAgainstStoreCore(batch, "doc_id", "text", sigs,
        numHashes = 16, bands = 8, minEstJaccard = 0.3,
        storeBanded = Some(Dedup.bandedPortable(sigs, 16, 8)),
        signatures = d => Dedup.minhashSignaturesPortable(d, "doc_id", "text"),
        banding = s => Dedup.bandedPortable(s, 16, 8),
        output = Dedup.IngestPairs)
    }
    assert(e2.getMessage.contains("pair output is reserved"), e2.getMessage)
  }

  test("incremental minhash: degenerate hot store buckets cap, bounded buckets still reject") {
    // 200 byte-identical store docs: every (band, bh) bucket they occupy
    // holds 200 members — far beyond LshMaxBucket (64). Without the cap
    // the store join enumerates bands × 200 candidates for any batch
    // near-dup; with it those flood buckets drop out entirely (the
    // documented recall trade: a flood that size is exact-dup territory).
    val floodText = (1 to 30).map(i => s"flood$i").mkString(" ")
    val normText = (1 to 30).map(i => s"norm$i").mkString(" ")
    val store = ((1L to 200L).map(i => (i, floodText)) ++
      (301L to 310L).map(i => (i, normText))).toDF("doc_id", "text")
    val storeSigs = Dedup.minhashSignaturesPortable(store, "doc_id", "text")
    val batch = Seq(
      (401L, (1 to 29).map(i => s"flood$i").mkString(" ")), // near-dup of the FLOOD → bucket capped → survives
      (402L, (1 to 29).map(i => s"norm$i").mkString(" ")),  // near-dup of the 10-doc bucket → rejected
      (403L, (1 to 30).map(i => s"new$i").mkString(" ")))   // genuinely new → kept
      .toDF("doc_id", "text")
    val kept = Dedup.newAgainstStoreMinhash(batch, "doc_id", "text", storeSigs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(401L, 403L), kept.toString)
  }

  test("span removal: canonical keeps the span, others lose exactly the covered tokens") {
    val span = (1 to 10).map(i => s"shared$i")  // 10 tokens → 3 windows at w=8
    val d = Seq(
      (1L, (span ++ Seq("tail1", "tail2")).mkString(" ")),  // canonical (min id)
      (2L, (Seq("head1", "head2") ++ span).mkString(" ")),  // loses span only
      (3L, (1 to 12).map(i => s"unique$i").mkString(" ")))  // untouched
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(d, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((12L, 0L, (span ++ Seq("tail1", "tail2")).mkString(" "))))
    // doc 2: windows at pos 2..4 cover tokens 2..11 = the whole span
    assert(got(2L) == ((12L, 10L, "head1 head2")))
    assert(got(3L) == ((12L, 0L, (1 to 12).map(i => s"unique$i").mkString(" "))))
  }

  test("boilerplate lines: df>maxDf lines vanish from every doc, variants share one fingerprint") {
    // Header's physical case/spacing varies per doc but normalizes to ONE
    // fingerprint (df 4 > maxDf 2 → removed everywhere, no canonical
    // survivor — unlike span removal); footer df 3 → removed; 'shared
    // twice' df 2 ≤ maxDf → kept; the blank line is exempt; kept lines
    // stay VERBATIM (doc 1 keeps its double space and case).
    val d = Seq(
      (1L, "THE  Header line\nBody  One\n\nshared twice\nfooter text"),
      (2L, "the header  LINE\nbody two\nshared twice\nfooter text"),
      (3L, "The Header Line\nbody three\nfooter text"),
      (4L, " the   header line \nbody four"))
      .toDF("doc_id", "text")
    val got = Dedup.removeBoilerplateLines(d, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((5L, 2L, "Body  One\n\nshared twice")))
    assert(got(2L) == ((4L, 2L, "body two\nshared twice")))
    assert(got(3L) == ((3L, 2L, "body three")))
    assert(got(4L) == ((2L, 1L, "body four")))
  }

  test("boilerplate removal is idempotent: a second pass removes nothing") {
    // removing ALL copies of a boilerplate line leaves every surviving
    // line's df unchanged, so a re-run over clean_text is the identity
    val d = Seq(
      (1L, "THE  Header line\nBody  One\n\nshared twice\nfooter text"),
      (2L, "the header  LINE\nbody two\nshared twice\nfooter text"),
      (3L, "The Header Line\nbody three\nfooter text"),
      (4L, " the   header line \nbody four"))
      .toDF("doc_id", "text")
    val once = Dedup.removeBoilerplateLines(d, "doc_id", "text", maxDf = 2)
      .select(col("doc"), col("clean_text"))
    val twice = Dedup.removeBoilerplateLines(
      once.withColumnRenamed("clean_text", "text"), "doc", "text", maxDf = 2)
    assert(twice.filter(col("n_removed") > 0).count() == 0)
    val t = twice.select(col("doc"), col("clean_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val o = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t == o)
  }

  test("boilerplate lines: sub-minLineChars lines are exempt from the census") {
    val d = (1L to 5L).map(i => (i, s"x\nbody $i")).toDF("doc_id", "text")
    // 'x' appears in all 5 docs; with minLineChars=2 it cannot be counted
    val keep = Dedup.removeBoilerplateLines(d, "doc_id", "text",
      maxDf = 2, minLineChars = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(keep(1L) == "x\nbody 1")
    // with the default minLineChars=1 it is boilerplate everywhere
    val gone = Dedup.removeBoilerplateLines(d, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(gone(1L) == "body 1")
  }

  test("paragraph dedup keeps each repeated paragraph's global first occurrence verbatim") {
    // 'shared para' appears in docs 1 (twice!) and 2/3 under spacing/case
    // variants: ONLY doc 1 pos 0 survives — later copies vanish including
    // the within-doc repeat; unique paragraphs and blanks are untouched
    val d = Seq(
      (1L, "Shared  PARA\nunique one\n\nshared para"),
      (2L, "shared para\nunique two"),
      (3L, " SHARED   para \nunique three"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((4L, 1L, "Shared  PARA\nunique one\n")),
      got(1L).toString)
    assert(got(2L) == ((2L, 1L, "unique two")))
    assert(got(3L) == ((2L, 1L, "unique three")))
  }

  test("paragraph dedup is idempotent and df-independent (no cap: even df=2 dedups)") {
    val d = Seq(
      (1L, "a b c\nfirst body"),
      (2L, "a b c\nsecond body"))
      .toDF("doc_id", "text")
    val once = Dedup.dedupParagraphs(d, "doc_id", "text")
      .select(col("doc"), col("clean_text"))
    val kept = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "a b c\nfirst body" && kept(2L) == "second body")
    val twice = Dedup.dedupParagraphs(
      once.withColumnRenamed("clean_text", "text"), "doc", "text")
    assert(twice.filter(col("n_removed") > 0).count() == 0)
  }

  test("corpus diff emits exactly the delta with the right statuses") {
    val old_ = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("doc_id", "text")
    val new_ = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(old_, new_, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"), got)
    // fingerprints carried: changed rows expose both sides, added/removed
    // carry a null on the absent side
    val rows = Dedup.corpusDiff(old_, new_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.isNullAt(2), r.isNullAt(3))).toSet
    assert(rows == Set((2L, false, false), (3L, false, true), (4L, true, false)))
  }

  test("duplicated spans: exact cross-doc windows, coverage union, hash-invariant") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, s"alpha beta $shared gamma"),          // shared run at pos 2..11 of 13
      (2L, s"$shared delta epsilon zeta"),        // shared run at pos 0..9 of 13
      (3L, "completely different words that never repeat anywhere at all ok"),
      (4L, "short text"))                         // < w tokens → zero windows
      .toDF("doc_id", "text")
    val res = Dedup.duplicatedSpans(d, "doc_id", "text", w = 8, portable = true)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 13 tokens → 6 windows; the 10-token shared run admits 3 fully
    // contained 8-windows, identical across docs 1 and 2; their union
    // covers the full 10 shared tokens → 10/13
    assert(res(1L) == ((6L, 3L, 0.76923)))
    assert(res(2L) == ((6L, 3L, 0.76923)))
    assert(res(3L) == ((3L, 0L, 0.0)))
    assert(res(4L) == ((0L, 0L, 0.0)))
    // the xxhash64 scale default is value-identical to the md5 portable
    // configuration (hash choice only changes the join keys)
    val fast = Dedup.duplicatedSpans(d, "doc_id", "text", w = 8, portable = false)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(fast == res)
  }

  test("maximal duplicated spans: hand-checked lengths, overlap counting, left/right maximality") {
    val d = Seq(
      (1L, "p q r s t u v w x y z"),  // shares "p q r s t u" with doc 2
      (2L, "m p q r s t u n o"),
      (3L, "a b c a b c a b c"),      // overlapping self-occurrences
      (4L, "nothing here repeats at all truly"))
      .toDF("doc_id", "text")
    val got = Dedup.maximalDuplicatedSpans(d, "doc_id", "text", minLen = 3)
      .orderBy("doc", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // doc1 pos0 "p q r s t u" (6): right-maximal (v≠n follows), left edge;
    // doc2 pos1 same span, pos0 "m …" not duplicated so left-maximal;
    // doc3: "a b c a b c" occurs at pos 0 and pos 3 (overlap counts —
    // the suffix-array semantics); every other start is an extendable
    // sub-span and must be suppressed by the maximality filter
    assert(got == Seq(
      (1L, 0L, 6L, "p q r s t u"),
      (2L, 1L, 6L, "p q r s t u"),
      (3L, 0L, 6L, "a b c a b c"),
      (3L, 3L, 6L, "a b c a b c")), got.mkString("\n"))
  }

  test("maximal duplicated spans: doubling ladder resolves a 40-token span exactly") {
    // span length 40 forces the ladder through 8→16→32 before the
    // bracketed resolve — the O(log) path, not just the seed round
    val run = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"aa bb $run cc dd ee"),
      (2L, s"xx $run yy zz"),
      (3L, "some entirely unrelated filler text that repeats nothing"))
      .toDF("doc_id", "text")
    val got = Dedup.maximalDuplicatedSpans(d, "doc_id", "text", minLen = 8)
      .orderBy("doc", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 40L), (2L, 1L, 40L)), got.mkString("\n"))
    // and every reported span string really does occur at >=2 positions:
    // recount via a direct substring scan (independent of the operator)
    import graft.functions.Text
    val spans = Dedup.maximalDuplicatedSpans(d, "doc_id", "text", minLen = 8)
      .select(col("span")).distinct().collect().map(_.getString(0))
    val toksAll = d.select(Text.tokens(lower(col("text"))).as("t"))
      .collect().map(_.getSeq[String](0).toSeq)
    spans.foreach { s =>
      val st = s.split(" ").toSeq
      val occ = toksAll.map(t => t.sliding(st.length).count(_ == st)).sum
      assert(occ >= 2, s"span '$s' occurs $occ times")
    }
  }

  test("maximal-span removal: canonical keeps, every other occurrence loses") {
    val d = Seq(
      (1L, "p q r s t u v w x y z"),  // canonical (min doc) of the span
      (2L, "m p q r s t u n o"),      // non-canonical occurrence
      (3L, "a b c a b c a b c"),      // within-doc repeat: FIRST pos keeps
      (4L, "nothing here repeats at all truly"))
      .toDF("doc_id", "text")
    val got = Dedup.removeMaximalSpans(d, "doc_id", "text", minLen = 3)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // doc1: canonical (1,0) < (2,1) — untouched. doc2 loses tokens 1-6.
    // doc3: "a b c a b c" at (3,0) and (3,3); canonical (3,0), the
    // occurrence at pos 3 removes tokens 3-8 (interval removal wins over
    // canonical coverage on the overlap, as in removeDuplicatedSpans).
    // doc4: unique prose, verbatim.
    assert(got == Seq(
      (1L, 11L, 0L, "p q r s t u v w x y z"),
      (2L, 9L, 6L, "m n o"),
      (3L, 9L, 6L, "a b c"),
      (4L, 6L, 0L, "nothing here repeats at all truly")), got.mkString("\n"))
  }

  test("maximal-span removal: the 40-token ladder span scrubs end-to-end") {
    val run = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"aa bb $run cc dd ee"),
      (2L, s"xx $run yy zz"),
      (3L, "some entirely unrelated filler text that repeats nothing"))
      .toDF("doc_id", "text")
    val got = Dedup.removeMaximalSpans(d, "doc_id", "text", minLen = 8)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 0L, s"aa bb $run cc dd ee"),
      (2L, 40L, "xx yy zz"),
      (3L, 0L, "some entirely unrelated filler text that repeats nothing")),
      got.mkString("\n"))
  }

  test("semantic dedup: collinear copies cluster together; pairs subset of exact") {
    // three well-separated directions in 4-dim space, each with a scaled
    // copy (collinear ⇒ cosine 1 ⇒ must be found), plus one orthogonal
    // singleton that pairs with nothing
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (11L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (12L, Array(0f, 3f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0.1f)), (13L, Array(0f, 0f, 0.5f, 0.05f)),
      (4L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val sem = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, k = 3, iters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(sem.keySet == Set((1L, 11L), (2L, 12L), (3L, 13L)))
    assert(sem.values.forall(_ >= 0.99999))
    // subset-of-exact invariant: clustering can only REMOVE candidate
    // pairs (cross-cluster), never invent them
    val exact = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.keySet.subsetOf(exact))
    // maxCluster = 1 truncates every cluster to a singleton → no pairs
    val truncated = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, k = 3, iters = 1, maxCluster = 1)
    assert(truncated.count() == 0L)
  }
}
