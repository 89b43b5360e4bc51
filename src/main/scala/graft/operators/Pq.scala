package graft.operators

import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression scale path for
  * embedding search, completing the ANN ladder (brute →
  * [[Similarity.srpTopK]] → [[Ivf]] → PQ): each vector is cut into `m`
  * subvectors, each subspace gets its own tiny k-means codebook, and a
  * vector is stored as `m` small centroid ids — 8 code bytes instead of
  * 256 float bytes per 64-dim vector. At 100 TB scale the codes (plus
  * one broadcast codebook of m·k·(dim/m) floats) are what sits in
  * executor memory; scoring reconstructs candidates on the fly from the
  * broadcast codebook, map-only.
  *
  * Scoring is cosine-against-reconstruction (the asymmetric-distance
  * family: the query stays exact, the candidate is its quantized
  * reconstruction) — one number any engine recomputes from the same
  * codebook, which keeps the WHOLE pipeline (per-subspace Lloyd build
  * included) under the DuckDB oracle exactly like [[Ivf]]'s.
  *
  * Determinism discipline (identical to [[Ivf.build]]):
  *  - seeds = the k lowest ids' subvectors per subspace, no RNG;
  *  - assignment = exact squared-L2 argmin, computed in DOUBLE with a
  *    left-to-right fold (bit-identical in any engine that folds
  *    sequentially), ties to the lowest centroid id;
  *  - centroid update = exact fixed-point (floor ×2^20 bigint sums) —
  *    byte-reproducible under any partitioning/AQE re-plan;
  *  - every Lloyd iteration's codebook is MATERIALIZED before the next
  *    assignment pass (constant-size plans, the iterative-lineage trap).
  *
  * All frames register in the "pq" [[Caches]] scope. */
object Pq {

  /** Exact squared L2 over two equal-length vector slices, DOUBLE
    * arithmetic, sequential fold — the engine-portable assignment
    * metric (cosine would need a norm guard for degenerate slices). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, d) => acc + d)

  /** (vid, j, sub) — the corpus cut into m contiguous subspace slices.
    * `dim` is passed, not inferred: an index built with the wrong dim
    * should fail loudly at build time, not quantize garbage. */
  private def subvectors(vecs: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m subspaces")
    val d = dim / m
    vecs.select(col("vid"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("vec"), j * d + 1, lit(d)))))
      .select(col("vid"), col("pos").as("j"), col("col").as("sub"))
  }

  /** Nearest centroid per (vid, j) against the broadcast codebook —
    * map-side partial aggregation (min_by under groupBy, not a window),
    * ties to the lowest centroid id. */
  private def assign(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), Seq("j"))
      .withColumn("d2", sqDist(col("sub"), col("cvec")))
      .groupBy(col("vid"), col("j"))
      .agg(any_value(col("sub")).as("sub"),
        min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** Per-(subspace, centroid) element-wise mean in exact fixed-point —
    * [[Ivf.updateCentroids]] with the subspace key carried through. */
  private def updateCodebook(assigned: DataFrame): DataFrame = {
    val scale = 1048576.0d // 2^20
    assigned.select(col("j"), col("cid"), posexplode(col("sub")))
      .groupBy(col("j"), col("cid"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * scale)).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("j"), col("cid"))
      .agg(any_value(col("n")).as("n"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("ss"))
      .select(col("j"), col("cid"),
        transform(col("ss"),
          e => (e.getField("s").cast("double") / col("n").cast("double") / scale)
            .cast("float")).as("cvec"))
  }

  /** Train the per-subspace codebooks: returns (j, cid, cvec) with
    * cid in 1..k. Seeds = the k lowest ids' slices in every subspace. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, dim: Int, iters: Int = 2): DataFrame = {
    val vecs = Caches.tracked(
      emb.select(col(idCol).as("vid"), col(vecCol).as("vec")), "pq")
    val subs = Caches.tracked(subvectors(vecs, m, dim), "pq")
    var codebook = subvectors(vecs.orderBy(col("vid")).limit(k), m, dim)
      .select(col("j"),
        row_number().over(Window.partitionBy(col("j")).orderBy(col("vid")))
          .as("cid"),
        col("sub").as("cvec"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val next = updateCodebook(assign(subs, codebook)).persist()
      next.count() // materialize before dropping the previous iteration
      prev.foreach(_.unpersist(false))
      prev = Some(next)
      codebook = next
    }
    prev.foreach(Caches.register(_, "pq"))
    codebook
  }

  /** Quantize the corpus: (vid, codes ARRAY<INT> in subspace order) —
    * the 8-bytes-per-vector serving representation. */
  def encode(emb: DataFrame, codebook: DataFrame, idCol: String,
             vecCol: String, m: Int, dim: Int): DataFrame = {
    val vecs = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    assign(subvectors(vecs, m, dim), codebook)
      .groupBy(col("vid"))
      .agg(array_sort(collect_list(struct(col("j"), col("cid")))).as("jc"))
      .select(col("vid"),
        transform(col("jc"), e => e.getField("cid")).as("codes"))
  }

  /** Rebuild approximate vectors from codes + the broadcast codebook —
    * what a scorer does on the fly per partition at serving time. */
  def reconstruct(codes: DataFrame, codebook: DataFrame): DataFrame =
    codes.select(col("vid"), posexplode(col("codes")))
      .select(col("vid"), col("pos").as("j"), col("col").as("cid"))
      .join(broadcast(codebook), Seq("j", "cid"))
      .groupBy(col("vid"))
      .agg(array_sort(collect_list(struct(col("j"), col("cvec")))).as("js"))
      .select(col("vid"),
        flatten(transform(col("js"), e => e.getField("cvec"))).as("rvec"))

  /** End-to-end approximate top-k: train, quantize, score every query's
    * EXACT vector against candidate RECONSTRUCTIONS, rank. Release the
    * build frames with `Caches.unpersistScope("pq")`. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, queryPred: Column,
           k: Int, m: Int, numCentroids: Int, dim: Int, iters: Int = 2,
           roundTo: Int = 5): DataFrame = {
    val codebook = build(emb, idCol, vecCol, m, numCentroids, dim, iters)
    val recon = reconstruct(
      encode(emb, codebook, idCol, vecCol, m, dim), codebook)
    val queries = emb.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .filter(queryPred)
    val scored = recon.join(broadcast(queries),
        col("vid") =!= col("query_id"))
      .withColumn("pq_cosine", round(cosineSim(col("qvec"), col("rvec")), roundTo))
    val w = Window.partitionBy("query_id").orderBy(desc("pq_cosine"), col("vid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"),
        col("pq_cosine"), col("rank"))
  }
}
