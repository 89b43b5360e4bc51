package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Property suites over GENERATED corpora for the in-row native dedup
  * expressions vs their composed/shuffled twins — the same approach that
  * found two real decimal bugs in the ClickHouse dialect grammar. The
  * fixed-corpus equality tests in `DedupSpec` pin known shapes; these
  * sweep the edge mix (empty docs, single tokens, unicode, heavy
  * duplication, docs shorter than the shingle width) that a handcrafted
  * corpus forgets. Deterministic seeds keep failures reproducible. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1042L + i)))

  // vocabulary mixes ASCII, unicode, numerics; tiny so shingles collide
  private val vocab = Vector("alpha", "beta", "Gamma", "héllo", "日本語",
    "x1", "x1", "the", "THE", "delta9", "émigré")
  private val docGen: Gen[String] = for {
    n <- Gen.frequency(2 -> Gen.const(0), 2 -> Gen.choose(1, 4),
      6 -> Gen.choose(5, 30))
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(4, 12)
    texts <- Gen.listOfN(n, docGen)
    // plant an exact duplicate so duplicate-insensitivity is exercised
    dup <- Gen.choose(0, n - 1)
  } yield (texts :+ texts(dup)).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: in-row minhash signatures equal the exploded-shuffle form on random corpora") {
    samples(corpusGen, 8).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val native = Dedup.minhashSignatures(df, "doc_id", "text",
          numHashes = 8, shingleN = 5)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val shuffled = Dedup.minhashSignaturesShuffled(df, "doc_id", "text",
          numHashes = 8, shingleN = 5)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // the shuffled twin drops token-less docs at the explode; every doc
      // it DOES emit must carry the identical signature
      assert(shuffled.keySet.subsetOf(native.keySet), s"corpus=$corpus")
      shuffled.foreach { case (d, sig) =>
        assert(native(d) == sig, s"doc $d of corpus=$corpus")
      }
      // and the only docs the twin may miss are genuinely token-less
      val tokenless = corpus.filter(_._2.trim.isEmpty).map(_._1).toSet
      assert(native.keySet -- shuffled.keySet subsetOf tokenless, s"corpus=$corpus")
    }
  }

  test("property: native simhash vote equals the 64-fold composable form on random corpora") {
    samples(corpusGen, 8).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val native = Dedup.simhash(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val composed = Dedup.simhashComposable(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == composed, s"corpus=$corpus")
    }
  }

  test("property: duplicated-span report is hash-choice-invariant on random corpora") {
    // fast xxhash64 windows vs portable md5 windows must agree row for
    // row — the hash is only a join key, so any discrepancy is a real
    // collision-or-logic bug, not a tolerance
    samples(corpusGen, 5).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      def rows(portable: Boolean) =
        Dedup.duplicatedSpans(df, "doc_id", "text", w = 3, portable = portable)
          .orderBy("doc").collect().map(_.toSeq).toSeq
      assert(rows(portable = false) == rows(portable = true), s"corpus=$corpus")
    }
  }
}
