package graft.operators

import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for similarity search, complementing
  * [[Similarity.srpTopK]]'s hyperplane buckets.
  *
  * Build: k centroids via Lloyd iterations on normalized vectors
  * (deterministic init: the k lowest ids — no RNG, stable across runs).
  * Centroids are tiny (k × dim floats) and live as a driver-side LITERAL
  * embedded in the plan; assignment is a per-row in-row argmax against
  * that literal, so building an index over N vectors is `iters` map-only
  * passes plus one small aggregate each — no shuffle of the corpus
  * itself, and quantizing the corpus costs zero exchanges.
  *
  * Probe: a query scans only its `nProbe` nearest centroid cells instead
  * of the whole corpus: expected work |C|·nProbe/k per query.
  */
object Ivf {

  /** Element-wise mean per cluster as ONE hash aggregate keyed on the
    * cluster id with `dim` bigint accumulators — no row fan-out: the old
    * posexplode form pushed N·dim rows through the partial aggregate's
    * hash machinery (key probe + buffer update per DIMENSION); wide
    * accumulators update dim sums per VECTOR in a single buffer row.
    * At crawl scale that is the difference between hashing 64 billion
    * and 1 billion rows per Lloyd pass.
    *
    * Accumulates in exact fixed-point (same rationale as
    * [[Vectors.centroids]]): float `avg` is partition-order-dependent, so
    * an index built twice over the same 100 TB corpus would get DIFFERENT
    * centroids (and different cell assignments) run to run. Exact bigint
    * sums make the build byte-reproducible under any partitioning —
    * per-element sums are the SAME `sum(floor(x·2^20))` terms the explode
    * form computed, so results are bit-identical and the oracle algebra
    * is untouched. */
  private def updateCentroids(assigned: DataFrame, dim: Int): DataFrame = {
    val scale = 1048576.0d // 2^20
    val sums = (0 until dim).map(i =>
      sum(floor(element_at(col("vec"), i + 1).cast("double") * scale))
        .as(s"s$i"))
    assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("centroid_id"),
        array((0 until dim).map(i =>
          (col(s"s$i").cast("double") / col("n").cast("double") / scale)
            .cast("float")): _*).as("cvec"))
  }

  /** Collect an existing (centroid_id, cvec) frame into the driver-side
    * entry list — for composers ([[Pq.ivfPqTopK]]) that want map-only
    * cell assignment against [[build]]'s returned centroid table (itself
    * a local relation, so the collect is free). k·dim floats, the one
    * structure small enough that driver-side materialization is the
    * right call (MLlib's KMeans keeps centers on the driver for the same
    * reason). Float bits survive the collect round trip exactly, so the
    * fixed-point byte-reproducibility contract is unaffected. */
  private[operators] def centroidSeqOf(centroids: DataFrame): Seq[(Int, Seq[Float])] =
    centroids.select(col("centroid_id"), col("cvec")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).sortBy(_._1).toSeq

  /** In-row nearest-centroid argmax against the driver-side entries:
    * strict `>` fold over id-ascending entries — keeps the LOWEST id on
    * ties and treats a NaN sim as largest, exactly `max_by(cid,
    * struct(sim, -cid))` under Spark's NaN-largest comparison rule
    * (zero-norm inputs score NaN). Since r18 this is the native
    * [[graft.plans.NearestCentroid]] codegen kernel — bit-identical to
    * the old `aggregate(transform(entries, …))` lambda chain (whose
    * interpreted per-element evaluation dominated every Lloyd pass's
    * task time, PqKernels scaladoc) and spec'd against it. */
  private[operators] def nearestCid(vec: Column,
                                    cents: Seq[(Int, Seq[Float])]): Column =
    graft.plans.NearestCentroid.nearestCid(vec, cents)

  /** Build the IVF index: returns (assignments, centroids), where
    * assignments carries (vid, vec, centroid_id) so callers can consume
    * the clustered corpus WITHOUT re-joining vectors on vid (the
    * assignment is a map-only projection — re-deriving it is free,
    * shuffling the corpus to join it back is not).
    *
    * Each Lloyd iteration assigns in-row against the LITERAL centroid
    * table, then runs one fixed-point update aggregation whose collect
    * (inside the loop) IS the materialization barrier — no persist/count
    * dance, no broadcast join, and plans stay constant-size because each
    * pass starts from an embedded literal, not the previous iteration's
    * lineage (the standard iterative-algorithm trap). The corpus never
    * shuffles for the build: `iters` map-only passes + one small
    * aggregate each. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 3): (DataFrame, DataFrame) = {
    val sess = emb.sparkSession
    val vecs = Caches.tracked(emb.select(col(idCol).as("vid"), col(vecCol).as("vec")), "ivf")
    // deterministic init: the k lowest ids, centroid_id 1..k in vid order
    var cents: Seq[(Int, Seq[Float])] = vecs.orderBy(col("vid")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Float](1).toSeq) }.toSeq
    // fail by name on an empty corpus (the r13 literal-centroid rewrite
    // would otherwise throw a bare NoSuchElementException off cents.head
    // where the old broadcast-join form returned empty frames)
    require(cents.nonEmpty,
      "Ivf.build: cannot seed centroids from an empty embedding frame")
    val dim = cents.head._2.length
    for (_ <- 1 to iters) {
      val assigned = vecs.select(
        nearestCid(col("vec"), cents).as("centroid_id"),
        col("vec"))
      cents = updateCentroids(assigned, dim).collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).sortBy(_._1).toSeq
    }
    import sess.implicits._
    val assignments = vecs.select(col("vid"), col("vec"),
      nearestCid(col("vec"), cents).as("centroid_id"))
    (assignments, cents.toDF("centroid_id", "cvec"))
  }

  /** Approximate top-k: score each query only against cells of its
    * `nProbe` nearest centroids. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, queryPred: Column,
           k: Int, numCentroids: Int, nProbe: Int = 2, iters: Int = 2,
           roundTo: Int = 5): DataFrame = {
    val (assignments, centroids) = build(emb, idCol, vecCol, numCentroids, iters)
    val corpus = assignments // (vid, vec, centroid_id) — map-only, no join
    val queries = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .filter(queryPred)
      .select(col("vid").as("query_id"), col("vec").as("qvec"))
    // nProbe nearest cells per query (against broadcast centroids).
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(desc("csim"), col("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineSim(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qvec"), col("centroid_id"))
    val scored = corpus.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vid") =!= col("query_id"))
      .withColumn("cosine", round(cosineSim(col("qvec"), col("vec")), roundTo))
    Ranking.topKByScore(scored, "query_id", "vid", "cosine", k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("cosine"), col("rank"))
  }
}
