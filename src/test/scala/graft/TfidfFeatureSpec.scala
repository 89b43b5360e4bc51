package graft

import graft.operators.{Tfidf, Vectors}
import org.apache.spark.sql.functions._

class TfidfFeatureSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf top terms: hand-computed tf/df ranks with term tie-break") {
    val docs = Seq(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "cherry cherry cherry durian").toDF("doc_id", "text")
    val res = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // df: apple 1, banana 2, cherry 2, durian 1
    assert(res((1L, 1L)) == (("apple", 2L, 1L, 2.0)))
    assert(res((1L, 2L)) == (("banana", 1L, 2L, 0.5)))
    // doc 2: banana and cherry tie at 0.5 → term order breaks the tie
    assert(res((2L, 1L)) == (("banana", 1L, 2L, 0.5)))
    assert(res((2L, 2L)) == (("cherry", 1L, 2L, 0.5)))
    assert(res((3L, 1L)) == (("cherry", 3L, 2L, 1.5)))
    assert(res((3L, 2L)) == (("durian", 1L, 1L, 1.0)))
  }

  test("feature hash: shape, parity conservation, determinism, layout-invariance") {
    val docs = Seq(
      1L -> "one two three four five six",
      2L -> "one one one",
      3L -> "completely different words here").toDF("doc_id", "text")
    val out = Vectors.hashedBow(docs, "doc_id", "text", dim = 16)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(rows.values.forall(_._2.length == 16))
    // every token contributes exactly ±1 to one bucket: the signed sum
    // over all buckets has the token count's parity, and total absolute
    // mass is bounded by the token count
    rows.foreach { case (_, (n, v)) =>
      assert(((v.sum - n) % 2 + 2) % 2 == 0)
      assert(v.map(math.abs).sum <= n)
    }
    assert(rows(1L)._1 == 6L && rows(2L)._1 == 3L)
    // identical text → identical vector regardless of doc id
    val twin = Vectors.hashedBow(
      Seq(7L -> "one two three four five six").toDF("doc_id", "text"),
      "doc_id", "text", dim = 16).collect().head.getSeq[Long](2)
    assert(twin == rows(1L)._2)
    // partition layout cannot change exact integer vectors
    val re = Vectors.hashedBow(docs.repartition(7), "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(re == rows.map { case (k, (_, v)) => k -> v })
    // the native one-pass expression is bit-equal to the composable
    // transform x aggregate form it replaced
    val comp = Vectors.hashedBowComposable(docs, "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(comp == rows.map { case (k, (_, v)) => k -> v })
  }
}
