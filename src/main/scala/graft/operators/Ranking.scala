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
  * on live data every suite run.
  *
  * ONE RUNTIME CAVEAT the plan cannot show (r14): `ObjectHashAggregateExec`
  * falls back to SORT-BASED aggregation once its in-memory map exceeds
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — whose
  * Spark default is 128 KEYS, a ceiling sized for aggregates with
  * unbounded buffers (`collect_list`), not for bounded k-heaps. Past it
  * the runtime sorts each partition by the grouping key anyway — the
  * exact cost this operator exists to avoid — while every plan-level
  * "no Sort exec" pin stays green, because the fallback is invisible in
  * the plan. Every helper here therefore raises the threshold to
  * [[Ranking.FallbackThreshold]] on the calling session when (and only
  * when) it still carries the Spark default — sized by the r14
  * adjudication, which measured BOTH failure directions at the ×20
  * scale point: left at 128, per-doc tf-idf ranking sort-fell-back and
  * regressed 2.8 → 6.2 s; raised to 2^17, the same aggregate held
  * keys × k × entry-bytes live per task (its partial ran on
  * TERM-partitioned input, so every task saw ~10⁵ doc keys) and OOM'd
  * the shared 8 GB local[32] heap in partial-buffer serialization. The
  * resolution is two-sided: high-cardinality rankings with WIDE entries
  * whose agg key is orthogonal to the input partitioning belong on
  * WindowGroupLimit, not the heap ([[Tfidf.topTerms]]/`topTermsBm25`
  * reverted — see the Tfidf class doc), and the heap keeps a MODEST
  * raise for the callers it genuinely fits (low-cardinality keys, thin
  * entries, k=1 canonicals). Beyond the raised threshold the sort
  * fallback is the RIGHT memory/speed trade and still correct —
  * RankingSpec's fallback guard pins both result-equality under a
  * forced fallback and fallback-freedom at 3×10⁴ keys per partition via
  * the exec's own `numTasksFallBacked` metric, the runtime-level
  * evidence the plan pins cannot give. */
object Ranking {

  /** See the class doc: the session conf key whose 128-key Spark default
    * silently turns every bounded-heap aggregate sort-based. */
  val FallbackThresholdKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** Keys the in-memory map may hold before the sort fallback: 2^15.
    * Sizing: one k-bounded heap per key, so worst-case live map memory
    * is threshold × k × entry-bytes ≈ 32768 × 10 × 500 B (JVM-object
    * entries, not packed rows) ≈ 160 MB per task at the widest
    * remaining caller — and an order less for the thin k=1 canonicals —
    * against a per-task budget of heap/slots (250 MB at the 8 GB
    * local[32] floor this was sized on; proportionally more on real
    * executors). 256× the Spark default, covering every key count the
    * remaining callers' input partitionings produce (per-partition fps,
    * query sets, group quotas); a genuinely hotter partition falls back
    * and stays correct. 2^17 was measured to OOM — see the class doc;
    * wide-entry key-orthogonal rankings must use the window instead. */
  val FallbackThreshold: Int = 32768

  /** Opt-out gate for the automatic raise (r15, ADVICE): set "false" and
    * the helpers leave `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` entirely alone — they stay correct (a heap
    * aggregate past 128 keys just sort-falls-back), and no unrelated
    * unbounded-buffer aggregate (`collect_list`) in the same session
    * inherits 256× more pre-fallback headroom as a side effect. */
  val AutoHeapRoomKey = "graft.ranking.autoHeapRoom"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val heapRoomLogged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Raise the fallback threshold on `df`'s session iff (a) the
    * [[AutoHeapRoomKey]] gate is not "false" and (b) the threshold still
    * holds the Spark default (an explicit non-default user setting wins;
    * an explicit 128 is indistinguishable from the default and gets
    * raised too — set 129 to mean it, or set the gate to "false").
    * Session-level and idempotent; runs at DataFrame-construction time,
    * before any action reads the conf. Because the raise outlives the
    * returned frame and applies to EVERY ObjectHashAggregate in the
    * session (it cannot be scoped to one plan), it announces itself: one
    * WARN per session naming the key, the new value, and the opt-out. */
  private def ensureHeapRoom(df: DataFrame): Unit = {
    val sess = df.sparkSession
    val conf = sess.conf
    if (conf.get(AutoHeapRoomKey, "true") != "false" &&
        conf.get(FallbackThresholdKey, "128") == "128") {
      conf.set(FallbackThresholdKey, FallbackThreshold.toString)
      if (heapRoomLogged.add(String.valueOf(System.identityHashCode(sess))))
        log.warn(s"graft.Ranking: raising session conf $FallbackThresholdKey " +
          s"128 -> $FallbackThreshold (bounded-heap top-k headroom; applies " +
          s"to ALL ObjectHashAggregates in this session, including " +
          s"collect_list/collect_set — set $AutoHeapRoomKey=false to opt out, " +
          s"or set the threshold explicitly to pin it)")
    }
  }

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
    ensureHeapRoom(scored)
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
    * keyCol, tieCol, scoreCol, carry…, `rankName` (1-based, long).
    *
    * For LOW-CARDINALITY keys (per-query ranks, per-batch canonicals):
    * the r13 tf-idf/BM25 per-doc callers were REVERTED to the window in
    * r14 — their agg key was orthogonal to the term-partitioned input,
    * the class-doc failure case both ways (fallback or OOM). */
  def topKCarrying(scored: DataFrame, keyCol: String, scoreCol: String,
                   tieCol: String, carry: Seq[String], k: Int,
                   rankName: String = "rank"): DataFrame = {
    ensureHeapRoom(scored)
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
    * corpus data.
    *
    * `neighbor_id` must be NUMERIC: the re-rank rides on
    * [[topKByScore]], whose tie-break negates the id (and overflows at
    * `Long.MinValue`) — inherited, not intrinsic to RRF. Both retrieval
    * halves here emit numeric document/vector ids (the documents and
    * embeddings fixtures share one BIGINT id space), so the constraint
    * costs nothing today; fusing string-keyed rank frames needs a
    * surrogate id first. End-to-end composition: `q_hybrid_search`
    * (SparkEntry) fuses [[Tfidf.searchBm25]]'s sparse ranking with
    * [[Pq.ivfPqTopK]]'s dense one over the same query set, oracle-exact. */
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
    * be unique per (key, row) for a deterministic kept set.
    *
    * CONTRACT — thin rows only: every column of `df` rides inside the
    * heap's comparison struct, so (a) columns should be ORDERABLE types
    * (the struct ordering tolerates an uncompared trailing payload in
    * this Spark build, but that is an implementation detail, not a
    * promise) and (b) every byte of the row is copied into each heap
    * insert/compare AND held in the in-memory map
    * ([[FallbackThreshold]] keys × k × row bytes).
    * Project the frame down to (key, orderCols, id)-shaped rows and join
    * any payload back — [[keepSmallestKIds]] packages exactly that for
    * callers with a unique row id ([[Sampling.groupCap]]); the direct
    * form is for frames that already ARE the thin projection
    * ([[Dedup.dedupParagraphs]]'s (fp, doc, pos) canonicals). */
  def keepSmallestK(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                    k: Int): DataFrame = {
    ensureHeapRoom(df)
    val entry = struct(orderCols :+
      struct(df.columns.map(col): _*).as("r"): _*)
    val top = GraftSqlBridge.column(new CollectTopK(
      GraftSqlBridge.expression(entry), k, true, 0, 0)
      .toAggregateExpression())
    df.groupBy(col(keyCol)).agg(top.as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.r.*"))
  }

  /** [[keepSmallestK]] with the PAYLOAD kept out of the heap: ranks the
    * thin (keyCol, orderCols, idCol) projection only, then left-semi
    * joins `df` back on `idCol`. Same kept set as the direct form
    * whenever `idCol` is unique across `df` (required — a duplicated id
    * would smuggle extra rows through the semi-join), which every quota
    * caller has (document/row ids). The trade, explicit: the heap's
    * exchange and in-memory map now carry id-width entries instead of
    * whole rows — full text never enters an aggregation buffer — at the
    * cost of the thin side recomputing `df`'s map-side projection (the
    * [[Caches]] persist rule: recompute that crosses no exchange beats
    * caching) plus one semi-join whose build side is the kept ids,
    * ≤ k·|groups| rows, broadcastable in every quota configuration.
    *
    * The uniqueness contract is GUARDED at runtime (r15, ADVICE), not
    * just documented: the kept-id frame passes through an in-plan
    * distinctness assertion (one extra aggregate over the ≤ k·|groups|
    * kept rows — ephemera, never `df`), so a duplicated id that ranks
    * into the kept set twice — within one group at k ≥ 2, or across
    * groups — fails BY NAME instead of silently returning more than k
    * rows per group through the semi-join. The one undetectable shape:
    * duplicated ids of which exactly ONE copy is kept (e.g. k = 1 with
    * both copies in the same group) — the old whole-row heap capped
    * those unconditionally; callers with possibly-non-unique ids must
    * use [[keepSmallestK]] directly. */
  def keepSmallestKIds(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                       idCol: String, k: Int): DataFrame = {
    val thin = df.select(col(keyCol) +: col(idCol) +:
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"_ord$i") }: _*)
    val kept = keepSmallestK(thin, keyCol,
        orderCols.indices.map(i => col(s"_ord$i")), k)
      .select(col(idCol))
      // in-plan guard: assert_true rides in a FILTER (a projected check
      // column would be pruned away with the assertion inside it);
      // passing rows evaluate to null -> isNull -> kept
      .groupBy(col(idCol)).agg(count(lit(1)).as("_dup"))
      .filter(assert_true(col("_dup") === 1,
        lit(s"Ranking.keepSmallestKIds: id column '$idCol' is not unique " +
          "(duplicate id ranked into the kept set) - the semi-join " +
          "payload restore requires unique ids; use keepSmallestK " +
          "directly for frames with non-unique ids")).isNull)
      .select(col(idCol))
    // USING-join reorders idCol first; restore the caller's column order
    df.join(kept, Seq(idCol), "left_semi").select(df.columns.map(col): _*)
  }
}
