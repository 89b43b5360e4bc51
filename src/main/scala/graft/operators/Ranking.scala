package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.functions._

/** Bounded per-key top-k — the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k` idiom
  * in every ANN serving path.
  *
  * Spark's rank-limit pushdown (WindowGroupLimit, 3.5+) already keeps
  * the window form's EXCHANGE bounded — partial group-limits run
  * map-side — but both the partial and final group-limits work by
  * SORTING their whole input partition (every candidate, O(n log n) per
  * partition, twice) before streaming off the first k per key, and at
  * 100 TB an IVF-PQ query probing nProbe/k of the corpus owns millions
  * of candidates per partition. This helper ranks with Spark's
  * `collect_top_k` aggregate instead (a size-k
  * [[org.apache.spark.util.BoundedPriorityQueue]] in the aggregation
  * buffer): a heap insert per candidate (O(n log k) with k ≪ n, no sort
  * of anything unbounded, no Sort exec in the plan at all), the same
  * partial/merge shape as any hash aggregate — a per-key TakeOrdered,
  * which is exactly what Spark itself picks for global
  * `ORDER BY ... LIMIT k`.
  *
  * Output rows and rank values are IDENTICAL to the window form: the
  * heap's struct ordering ((score, −id) ascending, largest kept) is the
  * same total order as `ORDER BY score DESC, id ASC` — Spark's struct
  * comparison uses the engine's double ordering (NaN largest, nulls
  * smallest), matching the window's `desc` NULLS LAST / NaN-first rule —
  * and the DuckDB oracles keep expressing rank as a SQL window, so the
  * equivalence sits under the correctness gate, not an epsilon.
  * [[Pq.topKReconstruct]] deliberately stays on the window form: PqSpec's
  * ADC==reconstruct twin equality then also pins heap-rank == window-rank
  * on live data every suite run. */
object Ranking {

  /** Top `k` rows per `keyCol` by (`scoreCol` DESC, `idCol` ASC), with a
    * 1-based dense `rank` column — byte-identical to
    * `row_number().over(Window.partitionBy(keyCol).orderBy(desc(scoreCol),
    * col(idCol))).filter(_ <= k)` followed by the same projection.
    * `idCol` must be numeric (the tie-break rides as a negated struct
    * field) and unique per key, which every ANN candidate set guarantees
    * (candidates are deduped ids). Output columns: keyCol, idCol,
    * scoreCol, rank. */
  def topKByScore(scored: DataFrame, keyCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    // CollectTopK sits in the INTERNAL function registry (the pandas-API
    // nsmallest/nlargest aggregate), not the SQL one, so it is wired by
    // expression: reverse=false keeps the k LARGEST (score, −id) structs
    // and eval() emits them already sorted descending — rank == pos + 1.
    val entry = struct(col(scoreCol).as("s"), (-col(idCol)).as("nv"),
      col(idCol).as("id"))
    val top = GraftSqlBridge.column(new CollectTopK(
      GraftSqlBridge.expression(entry), k, false, 0, 0)
      .toAggregateExpression())
    scored.groupBy(col(keyCol)).agg(top.as("top"))
      .select(col(keyCol), posexplode(col("top")))
      .select(col(keyCol), col("col.id").as(idCol), col("col.s").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Top `k` rows per `keyCol` by (`scoreCol` DESC, `tieCol` ASC) where
    * the tie-break is any orderable type (term strings), carrying
    * `carry` columns through unchanged — the [[topKByScore]] shape for
    * rankings whose tie column cannot be negated. The heap instead keeps
    * the k SMALLEST (−score, tie) structs (CollectTopK reverse=true),
    * which is the same total order… except at the edges negation cannot
    * mirror: NaN (desc ranks it first; negated NaN stays NaN and sorts
    * last) and NULL (desc trails it; a negated null leads a keep-smallest
    * heap). This variant therefore REQUIRES non-null, NaN-free scores —
    * true by construction for tf/df and BM25 (ratios of positive
    * integers); the ANN paths, whose zero-norm vectors can score NaN,
    * use [[topKByScore]]'s NaN/null-consistent form instead. Output:
    * keyCol, tieCol, scoreCol, carry…, `rankName` (1-based, long). */
  def topKCarrying(scored: DataFrame, keyCol: String, scoreCol: String,
                   tieCol: String, carry: Seq[String], k: Int,
                   rankName: String = "rank"): DataFrame = {
    val entry = struct(
      (-col(scoreCol)).as("ns") +: col(tieCol).as("t") +:
        col(scoreCol).as("s") +: carry.map(c => col(c).as(c)): _*)
    val top = GraftSqlBridge.column(new CollectTopK(
      GraftSqlBridge.expression(entry), k, true, 0, 0)
      .toAggregateExpression())
    scored.groupBy(col(keyCol)).agg(top.as("top"))
      .select(col(keyCol), posexplode(col("top")))
      .select(col(keyCol) +: col("col.t").as(tieCol) +:
        col("col.s").as(scoreCol) +: carry.map(c => col(s"col.$c").as(c)) :+
        (col("pos") + 1).cast("long").as(rankName): _*)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009 — the hybrid-search
    * ensemble Elasticsearch/Vespa ship): combine two rankings of the
    * same query set purely in RANK space, `score(d) = Σ_systems
    * 1/(k0 + rank_s(d))`, so systems with incomparable score scales
    * (BM25 vs cosine, exact vs quantized) fuse without calibration. A
    * document missing from one system's list contributes 0 from it.
    *
    * Inputs are rank frames as every ANN/retrieval operator here emits
    * them — (query_id, neighbor_id, rank) with rank 1-based — already
    * truncated to each system's own top-k. Output: (query_id,
    * neighbor_id, rrf_score, rank), re-ranked by [[topKByScore]]
    * (score DESC, neighbor_id ASC; ties are REAL in rank space — two
    * docs each found by only one system at the same rank tie exactly).
    *
    * Engine-portability: every score is a fixed chain of exact IEEE
    * ops on small integers (`1.0/(rank+k0)`, one addition), so fused
    * scores are bit-identical in any engine that mirrors the chain —
    * no rounding needed. Scale shape: rank frames are (queries × k)
    * rows — tiny relative to the corpora that produced them — so the
    * full-outer join and the re-rank aggregate move ephemera, never
    * corpus data. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    def recip(df: DataFrame, out: String) =
      df.select(col("query_id"), col("neighbor_id"),
        (lit(1.0d) / (col("rank") + lit(k0.toLong)).cast("double")).as(out))
    val scored = recip(a, "ra").join(recip(b, "rb"),
        Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(col("ra"), lit(0.0d)) + coalesce(col("rb"), lit(0.0d)))
          .as("rrf_score"))
    topKByScore(scored, "query_id", "neighbor_id", "rrf_score", k)
  }

  /** The k FIRST rows per `keyCol` under `orderCols` ASCENDING (all
    * directions up, so any orderable types work — no negation, no
    * null/NaN caveat: ascending keep-smallest agrees with an ascending
    * window everywhere, nulls first in both). Returns the kept rows with
    * `df`'s own columns, no rank — the per-group QUOTA shape
    * ([[Sampling.groupCap]]'s "at most n per domain"). `orderCols` must
    * be unique per (key, row) for a deterministic kept set. */
  def keepSmallestK(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                    k: Int): DataFrame = {
    val entry = struct(orderCols :+
      struct(df.columns.map(col): _*).as("r"): _*)
    val top = GraftSqlBridge.column(new CollectTopK(
      GraftSqlBridge.expression(entry), k, true, 0, 0)
      .toAggregateExpression())
    df.groupBy(col(keyCol)).agg(top.as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.r.*"))
  }
}
