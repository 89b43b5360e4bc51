package graft

import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("build produces k centroids and a total assignment") {
    val (assignments, centroids) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(centroids.count() <= 8 && centroids.count() > 0)
    assert(assignments.count() == emb.count())
    // every vector lands in exactly one cell
    assert(assignments.select("vid").distinct().count() == emb.count())
  }

  test("ivf top-k is deterministic and ranks correctly") {
    val q = col("vid") % 100 === 0
    val a = Ivf.topK(emb, "vec_id", "embedding", q, k = 5,
      numCentroids = 8, nProbe = 2).collect()
    val b = Ivf.topK(emb, "vec_id", "embedding", q, k = 5,
      numCentroids = 8, nProbe = 2).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    a.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length))
    }
  }

  test("probing more cells converges toward exact brute force") {
    val q = col("vid") % 100 === 0
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(nProbe: Int): Double = {
      val approx = Ivf.topK(emb, "vec_id", "embedding", q, k = 5,
        numCentroids = 4, nProbe = nProbe)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (approx & exact).size.toDouble / exact.size
    }
    val rAll = recall(4)   // probing every cell == exhaustive
    assert(rAll == 1.0)
    assert(recall(1) <= rAll)
  }

  test("index build is byte-reproducible under repartitioning") {
    def assignments(parts: Int) =
      Ivf.build(emb.repartition(parts), "vec_id", "embedding", k = 4)._1
        .collect()
        .map(r => (r.getAs[Long]("vid"), r.getAs[Int]("centroid_id")))
        .sortBy(_._1).toSeq
    // fixed-point centroid accumulation is associative: any partitioning
    // yields the same centroids, hence the same cell assignments
    assert(assignments(1) == assignments(7))
  }
}
