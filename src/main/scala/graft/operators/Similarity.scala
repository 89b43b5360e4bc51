package graft.operators

import graft.functions.Vectors
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Two paths, per the scale plan:
  *  - [[bruteForceTopK]]: exact cosine top-k. The (small) query set is
  *    broadcast against the candidate corpus, so the corpus side never
  *    shuffles — each executor streams its candidate partitions once per
  *    plan, and top-k is a per-query window. This is the correctness
  *    baseline the oracle checks.
  *  - [[srpTopK]]: sign-random-projection LSH. Candidates are restricted to
  *    vectors sharing a hyperplane-sign bucket with the query, turning the
  *    O(|Q|·|C|) scan into bucket-local joins. Recall < 1 by construction;
  *    probe neighboring buckets by lowering `planes`.
  *
  * Similarities are computed by the native allocation-free
  * [[graft.plans.CosineSimilarity]] expression: dot/sqrt(|a|²·|b|²) in
  * double precision with the same association DuckDB's
  * `list_cosine_similarity` uses, so oracle comparisons agree to ~1 ulp
  * before rounding.
  */
object Similarity {

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))

  /** Exact cosine top-k of `corpus` for each row matching `queryPred`.
    * Output: (query_id, neighbor_id, cosine, rank) with rank 1..k by
    * (rounded cosine desc, neighbor id) — rounding first makes the ranking
    * stable across engines that differ in the last float ulp. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int, roundTo: Int = 5): DataFrame = {
    val all = prepared(emb, idCol, vecCol)
    val q = all.filter(queryPred)
      .select(col("vid").as("query_id"), col("vec").as("qvec"))
    val scored = all.join(broadcast(q), col("vid") =!= col("query_id"))
      .withColumn("cosine", round(cosineSim(col("qvec"), col("vec")), roundTo))
    Ranking.topKByScore(scored, "query_id", "vid", "cosine", k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** SRP-LSH approximate top-k with MULTI-PROBE: candidates are vectors
    * sharing any of the query's `probes` probe buckets — its own
    * hyperplane-sign bucket plus the `probes−1` lowest-margin single-bit
    * flips ([[graft.plans.SrpProbes]]). With `planes` sign bits the
    * corpus splits into ≤2^planes buckets; expected per-query work is
    * `probes·|C|/2^planes`.
    *
    * Scale shape: the corpus side carries exactly ONE bucket per row and
    * never shuffles (the query set is broadcast); only the broadcast side
    * fans out ×probes, and duplicate (query, candidate) hits from
    * overlapping probes are deduped at candidate cardinality before
    * ranking. Defaults (planes=6, probes=4) clear recall@10 ≥ 0.9 at the
    * sf1 bench point — the measured recall/cost curve is in the bench
    * artifact (`recall_curve`); single-probe (probes=1) keeps the r5
    * plan bit-for-bit. */
  def srpTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, planes: Int = 6, probes: Int = 4,
              roundTo: Int = 5): DataFrame = {
    val all = prepared(emb, idCol, vecCol)
      .withColumn("bucket", Vectors.srpBucket(col("vec"), planes))
    val q0 = all.filter(queryPred)
    val q =
      if (probes == 1)
        q0.select(col("vid").as("query_id"), col("vec").as("qvec"), col("bucket"))
      else
        q0.select(col("vid").as("query_id"), col("vec").as("qvec"),
          explode(Vectors.srpProbes(col("vec"), planes, probes)).as("bucket"))
    val cand = all.join(broadcast(q), Seq("bucket"))
      .filter(col("vid") =!= col("query_id"))
    val deduped = if (probes == 1) cand else cand.dropDuplicates("query_id", "vid")
    val scored = deduped
      .withColumn("cosine", round(cosineSim(col("qvec"), col("vec")), roundTo))
    Ranking.topKByScore(scored, "query_id", "vid", "cosine", k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("cosine"), col("rank"))
  }
}
