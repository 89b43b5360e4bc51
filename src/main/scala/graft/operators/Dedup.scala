package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline surface: exact,
  * normalized, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale notes (the 100 TB story):
  *  - exact/normalized dedup is a single hash aggregate on a fingerprint —
  *    one shuffle on the dedup key, map-side partial aggregation.
  *  - MinHash signatures are computed in ONE pass over the exploded shingle
  *    table (k min-aggregates in the same groupBy), not k passes.
  *  - candidate generation joins on (band, bandHash) buckets; bucket size
  *    is capped ([[LshMaxBucket]]) so a degenerate hot bucket (all-equal
  *    docs) cannot go quadratic — the cap drops only buckets that exact
  *    dedup should have removed first anyway.
  *  - all pair outputs use `idA < idB` so each pair appears once.
  */
object Dedup {

  /** Exact duplicate groups by md5 fingerprint of `text`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Whitespace/case-insensitive duplicate groups. */
  def normalizedGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs — the base table for MinHash and Jaccard. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(Text.shingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** MinHash signatures: k deterministic hash families via
    * `xxhash64(seed_i, shingle)`, all k minima computed in one aggregate
    * pass. Returns (doc, sig array<long>). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleN: Int = 5): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, shingleN)
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col("doc"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  val LshMaxBucket = 64

  /** LSH banding: split the signature into `bands` bands, hash each band,
    * and emit candidate pairs that share at least one band bucket.
    * Estimated Jaccard = fraction of equal signature components. */
  def minhashCandidates(sigs: DataFrame, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val banded = sigs.select(col("doc"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    // Cap pathological buckets before the self-join can go quadratic.
    val bucketed = banded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= LshMaxBucket)
    val a = bucketed.select(col("band"), col("band_hash"),
      col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = bucketed.select(col("band"), col("band_hash"),
      col("doc").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(numHashes).cast("double"))
      .drop("sig_a", "sig_b")
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

  /** 64-bit SimHash over whitespace tokens, weighted by in-doc token count:
    * bit i of the signature is the sign of Σ weight·(±1 by bit i of
    * xxhash64(token)). One explode + one 64-column aggregate pass. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        explode(Text.tokens(lower(col(textCol)))).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w"))
        .otherwise(-col("w"))).as(s"b$i")
    }
    toks.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dups within `maxHamming`: band the 64-bit signature into
    * 4×16-bit chunks — any pair with hamming ≤ 3 must agree on ≥1 chunk
    * (pigeonhole), so a chunk-equality join finds all of them without a
    * cross join. */
  def simhashNearDups(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val chunked = sigs.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
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

  /** Exact n-gram Jaccard near-dups. Candidates come from an inverted-index
    * self-join restricted to discriminative shingles (document frequency in
    * [2, dfMax]); exact |A∩B| is then recounted over the candidates' FULL
    * shingle sets, so the reported Jaccard is exact, not an estimate. */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 5, dfMax: Int = 20,
                      minJaccard: Double = 0.5): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, shingleN)
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("set_size"))
    val discriminative = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= dfMax)
        .select("shingle"),
      Seq("shingle"))
    val cand = discriminative.select(col("shingle"), col("doc").as("doc_a"))
      .join(discriminative.select(col("shingle"), col("doc").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val candDocs = cand.select(col("doc_a").as("doc")).union(cand.select(col("doc_b"))).distinct()
    val candSh = sh.join(candDocs, Seq("doc"))
    val common = candSh.select(col("shingle"), col("doc").as("doc_a"))
      .join(candSh.select(col("shingle"), col("doc").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      .join(cand, Seq("doc_a", "doc_b"))
    common
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("set_size", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("set_size", "size_b"), Seq("doc_b"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }
}
