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
  * Centroids are tiny (k × dim floats) and live broadcast; assignments are
  * a per-row argmax against the broadcast list, so building an index over
  * N vectors is `iters` map-only passes plus one small aggregate each —
  * no shuffle of the corpus itself.
  *
  * Probe: a query scans only its `nProbe` nearest centroid cells instead
  * of the whole corpus: expected work |C|·nProbe/k per query.
  */
object Ivf {

  /** Element-wise mean per cluster via posexplode(dim) + groupBy — the
    * dimension explode multiplies rows by `dim`, but only for ONE
    * aggregation pass per Lloyd iteration, and it keeps the update fully
    * distributed (no driver-side math over the corpus).
    *
    * Accumulates in exact fixed-point (same rationale as
    * [[Vectors.centroids]]): float `avg` is partition-order-dependent, so
    * an index built twice over the same 100 TB corpus would get DIFFERENT
    * centroids (and different cell assignments) run to run. Exact bigint
    * sums make the build byte-reproducible under any partitioning. */
  private def updateCentroids(assigned: DataFrame): DataFrame = {
    val scale = 1048576.0d // 2^20
    assigned.select(col("centroid_id"), posexplode(col("vec")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * scale)).as("s"),
        count(lit(1)).as("n"))
      .groupBy("centroid_id")
      .agg(any_value(col("n")).as("n"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("ss"))
      .select(col("centroid_id"),
        transform(col("ss"),
          e => (e.getField("s").cast("double") / col("n").cast("double") / scale)
            .cast("float")).as("cvec"))
  }

  /** Nearest-centroid id for `vec` against a broadcast centroid table.
    * argmax via `max_by` under groupBy, NOT a window: map-side partial
    * aggregation collapses the k-way fan-out before the shuffle, so the
    * exchange moves one row per vector (a window would shuffle all N·k
    * scored rows and sort them). Tie-break: lowest centroid id. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("sim", cosineSim(col("vec"), col("cvec")))
      .groupBy(col("vid"))
      .agg(any_value(col("vec")).as("vec"),
        max_by(col("centroid_id"), struct(col("sim"), -col("centroid_id")))
          .as("centroid_id"))

  /** Build the IVF index: returns (assignments, centroids).
    *
    * Each Lloyd iteration's centroid table is MATERIALIZED (persist +
    * count) before the next assignment pass: centroids are k×dim floats —
    * trivially small at any corpus scale — but without the cut, iteration
    * i's plan nests every previous iteration's cross-join and the work
    * grows quadratically in `iters` (the standard iterative-algorithm
    * lineage trap; MLlib's KMeans keeps centers on the driver for the
    * same reason). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 3): (DataFrame, DataFrame) = {
    // corpus + final centroids stay cached until the caller materializes
    // its result — registered with Caches so long-lived sessions reclaim
    // them; superseded per-iteration centroid tables are unpersisted
    // EAGERLY (safe: the next table is counted, i.e. fully materialized,
    // before its predecessor is dropped).
    val vecs = Caches.tracked(emb.select(col(idCol).as("vid"), col(vecCol).as("vec")), "ivf")
    var centroids = vecs.orderBy(col("vid")).limit(k)
      .select(row_number().over(Window.orderBy(col("vid"))).as("centroid_id"),
        col("vec").as("cvec"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val next = updateCentroids(assign(vecs, centroids)).persist()
      next.count() // materialize before dropping the previous iteration
      prev.foreach(_.unpersist(false))
      prev = Some(next)
      centroids = next
    }
    prev.foreach(Caches.register(_, "ivf")) // the surviving table outlives the build
    (assign(vecs, centroids).select("vid", "centroid_id"), centroids)
  }

  /** Approximate top-k: score each query only against cells of its
    * `nProbe` nearest centroids. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, queryPred: Column,
           k: Int, numCentroids: Int, nProbe: Int = 2, iters: Int = 2,
           roundTo: Int = 5): DataFrame = {
    val (assignments, centroids) = build(emb, idCol, vecCol, numCentroids, iters)
    val vecs = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val corpus = vecs.join(assignments, Seq("vid"))
    val queries = vecs.filter(queryPred)
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
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("vid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("cosine"), col("rank"))
  }
}
