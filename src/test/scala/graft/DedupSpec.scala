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

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, shingleN = 3, minEstJaccard = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 101L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 2L) })
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sigs = Dedup.simhash(corpus, "doc_id", "text")
    val byDoc = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(byDoc(1L), byDoc(101L)) < hamming(byDoc(1L), byDoc(2L)))
    assert(byDoc(2L) == byDoc(102L)) // identical text → identical signature
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
}
