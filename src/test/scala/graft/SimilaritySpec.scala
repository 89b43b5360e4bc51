package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Deterministic corpus: vec 0 nearly parallel to vec 1, orthogonal-ish
  // to the rest.
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with id tie-break") {
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      col("vid") === 0, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(math.abs(got.head._2 - 0.99496) < 1e-4)
    assert(got.last._2 == 0.0)
  }

  test("results match a driver-side naive computation") {
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (xy, xx, yy) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((sxy, sxx, syy), (x, y)) =>
          (sxy + x.toDouble * y.toDouble, sxx + x.toDouble * x.toDouble,
            syy + y.toDouble * y.toDouble)
      }
      xy / math.sqrt(xx * yy)
    }
    val q = rows.find(_._1 == 0L).get
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) => id -> BigDecimal(cos(q._2, v))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy { case (id, c) => (-c, id) }.map(_._1).toSeq
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      col("vid") === 0, k = 4).orderBy("rank")
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got == expected)
  }

  test("SRP-LSH returns a subset of true candidates with valid ranks") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vid") % 100 === 0, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.srpTopK(emb, "vec_id", "embedding",
      col("vid") % 100 === 0, k = 5, planes = 4).collect()
    assert(approx.nonEmpty)
    // every reported neighbor shares the query's bucket — spot-check rank sanity
    approx.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.size))
    }
    // recall: approximate neighbors that ARE in the exact top-5 exist
    assert(approx.exists(r =>
      exact.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))))
  }

  test("srpProbes: probe 0 is the own bucket, flips are distinct single bits") {
    import graft.functions.{Vectors => VF}
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vid", "vec")
    val planes = 8
    val probes = 4
    val rows = vecs.select(
      VF.srpBucket(col("vec"), planes).as("own"),
      VF.srpProbes(col("vec"), planes, probes).as("probes")).collect()
    rows.foreach { r =>
      val own = r.getAs[Long]("own")
      val ps = r.getSeq[Long](1)
      assert(ps.length == probes)
      assert(ps.head == own)
      // each later probe flips exactly one plane bit of the own bucket
      ps.tail.foreach(p => assert(java.lang.Long.bitCount(p ^ own) == 1))
      assert(ps.distinct.length == probes) // all probes hit distinct buckets
    }
  }

  test("multi-probe SRP recall dominates single-probe and stays rank-sane") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vid") % 100 === 0
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(probes: Int): Double = {
      val a = Similarity.srpTopK(emb, "vec_id", "embedding", pred, k = 5,
        planes = 6, probes = probes).collect()
      a.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
        val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
        assert(ranks == (1L to ranks.size)) // dedup held: no repeated ranks
      }
      a.count(r => exact.contains(
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))).toDouble / exact.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"multi-probe recall $r4 below single-probe $r1")
  }

  test("native srpBucket is bit-equivalent to the composable twin") {
    import graft.functions.{Vectors => VF}
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 300).map(i =>
      (i.toLong, Seq.fill(24)(rnd.nextFloat() * 2 - 1))).toDF("vid", "vec")
    for (seed <- Seq(0, 3); planes <- Seq(1, 10, 24)) {
      val diff = vecs.select(
        VF.srpBucket(col("vec"), planes, seed).as("native"),
        VF.srpBucketComposable(col("vec"), planes, seed).as("comp"))
        .filter(col("native") =!= col("comp")).count()
      assert(diff == 0, s"seed=$seed planes=$planes")
    }
  }
}
