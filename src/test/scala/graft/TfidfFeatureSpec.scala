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

  test("bm25 top terms: hand-computed saturation, length normalization, tie-break") {
    val docs = Seq(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "cherry cherry cherry durian").toDF("doc_id", "text")
    val res = Tfidf.topTermsBm25(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // dl: 3, 2, 4; avgdl = 3.0; satTf(tf, dl) with k1=1.2, b=0.75:
    //   tf*2.2 / (tf + 1.2*(0.25 + 0.75*dl/avgdl))
    def sat(tf: Long, dl: Long): Double =
      (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * (dl.toDouble / 3.0)))
    assert(res((1L, 1L)) == (("apple", 2L, 1L, 3L, sat(2, 3) / 1.0)))
    assert(res((1L, 2L)) == (("banana", 1L, 2L, 3L, sat(1, 3) / 2.0)))
    // doc 2: banana/cherry tie (same tf, df, dl) → term order breaks it
    assert(res((2L, 1L)) == (("banana", 1L, 2L, 2L, sat(1, 2) / 2.0)))
    assert(res((2L, 2L)) == (("cherry", 1L, 2L, 2L, sat(1, 2) / 2.0)))
    // doc 3 is where bm25 diverges from tf/df: under tf/df cherry
    // (tf=3, df=2 → 1.5) beats durian (1.0); saturation caps cherry's
    // repeats at sat(3,4)/2 ≈ 0.733 and the rarer durian wins at 0.88
    assert(res((3L, 1L)) == (("durian", 1L, 1L, 4L, sat(1, 4) / 1.0)))
    assert(res((3L, 2L)) == (("cherry", 3L, 2L, 4L, sat(3, 4) / 2.0)))
    // saturation: tf=3 in doc 3 scores LESS than 3x its tf=1 sibling's
    // pre-idf mass, and a shorter doc outranks a longer one at equal tf
    assert(sat(3, 4) < 3 * sat(1, 4))
    assert(sat(1, 2) > sat(1, 4))
    graft.operators.Caches.unpersistAll()
  }

  test("bm25 search: self-retrieval, multi-term accumulation, absent terms score nothing") {
    val docs = Seq(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "cherry cherry cherry durian",
      4L -> "elderberry fig").toDF("doc_id", "text")
    val queries = Seq(
      (100L, "durian"),            // unique term → only doc 3 retrievable
      (200L, "apple banana"),      // multi-term: doc 1 holds both
      (300L, "zzz")                // vocabulary miss → no results at all
    ).toDF("qid", "qtext")
    val res = Tfidf.searchBm25(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(res((100L, 1L)) === 3L)
    assert(!res.contains((100L, 2L)), res)          // nothing else has durian
    assert(res((200L, 1L)) === 1L)                  // both terms accumulate
    assert(res((200L, 2L)) === 2L)                  // banana-only hit
    assert(!res.contains((200L, 3L)), res)          // doc 3 has no query term
    assert(!res.keys.exists(_._1 == 300L), res)     // miss emits no rows
    // the two-term hit strictly outscores the single-term hit for q200
    val scores = Tfidf.searchBm25(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .filter(col("query_id") === 200L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L), scores)
    graft.operators.Caches.unpersistAll()
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
