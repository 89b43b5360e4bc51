package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document characteristic-term extraction — the tf-idf step of corpus
  * analytics (topic labeling, keyword indexing, stopword discovery),
  * complementing [[Familiarity]]'s corpus-frequency join per token.
  *
  * Weighting: terms rank by `tf / df` — term frequency scaled by the
  * LINEAR inverse document frequency — rather than `tf · ln(N/df)`.
  * Deliberate, for engine portability: ln is a transcendental whose
  * last-ulp varies by libm, which would make cross-engine runs (and the
  * DuckDB oracle) flake at rounding boundaries, while `tf::double /
  * df::double` is a single correctly rounded IEEE division, bit-identical
  * everywhere. Both weightings order by rising tf and falling df; the
  * exact integers (tf, df) ride along so a downstream consumer can apply
  * any idf curve (including true log idf) without recomputation.
  *
  * Scale shape: one shuffle of (doc, term) pairs for tf (map-side
  * combinable counts), one vocabulary-sized aggregate for df, per-doc
  * top-k via the `row_number` WINDOW (WindowGroupLimit pushdown bounds
  * the exchange map-side). The window form is a MEASURED r14 decision,
  * REVERTING r13's bounded-heap rewrite for these two rankings: the
  * scored frame arrives TERM-partitioned (the df join's exchange), so
  * the heap's partial aggregate sees nearly every doc key in every
  * partition — at the ×20 scale point that meant 10⁵ keys/partition,
  * where the ObjectHashAggregate either sort-falls-back at the 128-key
  * default (q_tfidf_topk ×20 regressed 2.8 → 6.2 s, the r13→r14
  * adjudication) or, with the threshold raised, holds keys × k × entry
  * bytes live per task and OOMs a shared-heap executor (measured: 8 GB
  * local[32] JVM died in partial-heap serialization). Per-doc rankings
  * whose agg key is orthogonal to the input partitioning belong on the
  * window; [[Ranking]]'s heap stays the right shape for low-cardinality
  * keys ([[searchBm25]]'s per-query rank, the ANN paths) and thin k=1
  * canonicals. The df join-back carries NO
  * broadcast hint on purpose: a natural-language vocabulary fits under
  * the auto-broadcast threshold and Catalyst broadcasts it unhinted,
  * but a web-scale token vocabulary does not bound (the same reason
  * [[Familiarity]] uses a shuffled equi-join) — a forced hint would
  * bypass the threshold safety exactly when it matters. The corpus
  * itself never broadcasts and never sorts globally. */
object Tfidf {

  /** A pre-built BM25 serving index — the sparse-retrieval twin of the
    * IVF-PQ serving tables ([[Pq.ivfPqServe]]): build once over the
    * corpus, serve query strings against it without touching the raw
    * text again.
    *
    *  - `postings`: (term, doc, tf, dl) — one row per distinct
    *    (document, term) pair, with the document length DENORMALIZED on
    *    so serving needs no per-doc join. On disk, bucket it by `term`
    *    (the serving join key) so a query's terms prune at the scan.
    *  - `termStats`: (term, df) — vocabulary-sized.
    *  - `corpusStats`: ONE row (n_docs, sum_dl), both exact BIGINTs;
    *    avgdl is derived at serve time by the same single IEEE division
    *    the inline path performs, so served scores are bit-identical.
    *
    * Every field is an exact integer, which is what makes
    * [[mergeBm25Index]] exact: over DISJOINT document sets, df and the
    * corpus sums are additive and postings/dl rows are per-doc, so
    * (build A) ⊕ (build B) == build(A ∪ B) rank-for-rank — appending a
    * day's batch to a 100 TB index is one pass over the batch plus a
    * vocabulary-sized stats merge, never a corpus rebuild. */
  final case class Bm25Index(postings: DataFrame, termStats: DataFrame,
                             corpusStats: DataFrame)

  /** Top `k` terms per document by `tf/df`, ties broken by term.
    * Output: (doc, rnk, term, tf, df, score). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    val pairs = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    // persisted: tf feeds BOTH the df aggregation and the join side, and
    // self-referenced subtrees get re-aliased attribute ids at analysis —
    // which defeats exchange reuse (measured: zero Reused* nodes in the
    // final adaptive plan; the tokenize+explode+partial-agg ran twice)
    val tf = Caches.tracked(
      pairs.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")),
      "tfidf")
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // window, not heap — the class-doc r14 adjudication: term-partitioned
    // input × per-doc keys is the heap's pathological case
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** BM25 SEARCH — rank documents for each QUERY STRING (the sparse half
    * of a hybrid retrieval stack; [[Ranking.rrfFuse]] composes its rank
    * frame with a dense ANN ranking): score(q, d) = Σ over q's DISTINCT
    * terms of `satTf(t,d) / df(t)`, the same saturated-tf linear-idf
    * term weight as [[topTermsBm25]] (and portable for the same reason).
    *
    * The one NEW portability hazard is the cross-term SUM: a sum of
    * doubles is aggregation-order-dependent, so each term's weight is
    * floored to 2^-20 fixed point and summed as BIGINT (the DSIR/
    * centroid discipline) — `score_c` is an order-free exact integer any
    * engine reproduces bit-for-bit.
    *
    * Scale shape: tf/df/dl build exactly as [[topTermsBm25]] (one corpus
    * shuffle, persisted tf frame); queries explode to DISTINCT (query,
    * term) pairs — tiny — and the term join is a shuffled equi-join on
    * the same vocabulary-key rationale as the df join (no broadcast
    * hint: a web-scale vocabulary does not bound, and the QUERY side is
    * the small one Catalyst broadcasts unhinted when it fits). Per-query
    * ranking is the bounded heap. Output: (query_id, doc, score_c,
    * rank). */
  def searchBm25(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qtextCol: String,
                 k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val pairs = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val tf = Caches.tracked(
      pairs.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")),
      "tfidf")
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val avgdl = dl.agg((sum(col("dl")).cast("double")
      / count(lit(1)).cast("double")).as("avgdl"))
    val qterms = queries.select(col(qidCol).as("query_id"),
        explode(array_distinct(Text.tokens(lower(col(qtextCol))))).as("term"))
    val satTf = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val scored = qterms.join(tf, Seq("term"))
      .join(df_, Seq("term")).join(dl, Seq("doc"))
      .crossJoin(broadcast(avgdl))
      .select(col("query_id"), col("doc"),
        floor(satTf / col("df").cast("double") * lit(1048576.0d))
          .cast("long").as("w_c"))
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(col("w_c")).as("score_c"))
    Ranking.topKByScore(scored, "query_id", "doc", "score_c", k)
  }

  /** Top `k` terms per document under BM25's tf-SATURATION curve with the
    * linear idf: `score = satTf / df` where
    * `satTf = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` — the Okapi
    * length-normalized saturation retrieval stacks use, with the log idf
    * replaced by the same linear `1/df` as [[topTerms]] and for the same
    * reason (ln's last ulp varies by libm; every term here is either an
    * exact integer — tf, df, dl — or one fixed chain of correctly rounded
    * IEEE ops the oracle mirrors textually, so scores are bit-identical
    * cross-engine). Unlike raw tf/df, repeats saturate (a term's 10th
    * occurrence adds almost nothing) and long documents stop dominating —
    * the standard relevance shape for corpus curation and query-doc
    * matching.
    *
    * Scale shape = [[topTerms]] plus one doc-length aggregate off the
    * SAME persisted tf frame (no second corpus pass) and a broadcast
    * 1-row avgdl. Output: (doc, rnk, term, tf, df, dl, score). */
  def topTermsBm25(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val pairs = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    // one persisted tf frame feeds df, dl AND the score join (same
    // re-aliased-attribute-id reuse trap as topTerms — see above)
    val tf = Caches.tracked(
      pairs.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")),
      "tfidf")
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    // integral sums ⇒ exact; ONE division for avgdl, broadcast back
    val avgdl = dl.agg((sum(col("dl")).cast("double")
      / count(lit(1)).cast("double")).as("avgdl"))
    // constant subterms (k1+1, 1−b) fold HERE, in Scala doubles, so the
    // oracle's textual folds of the same literals land on the same bits
    val satTf = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    // window, not heap — same r14 adjudication as topTerms
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, Seq("term")).join(dl, Seq("doc"))
      .crossJoin(broadcast(avgdl))
      .withColumn("score", satTf / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc"), col("rnk"), col("term"), col("tf"), col("df"),
        col("dl"), col("score"))
  }

  /** Build a [[Bm25Index]] over `docs` — the index-construction half of
    * the sparse serve/build split. ONE corpus shuffle of (doc, term)
    * pairs (the persisted tf frame feeds df, dl, the postings join AND
    * the corpus totals), then vocabulary- and doc-sized aggregates. The
    * serving caller persists the three frames (postings bucketed by
    * `term`) and pays this cost once per corpus, not per query. */
  def buildBm25Index(docs: DataFrame, idCol: String,
                     textCol: String): Bm25Index = {
    val pairs = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val tf = Caches.tracked(
      pairs.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")),
      "tfidf")
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dl, Seq("doc"))
      .select(col("term"), col("doc"), col("tf"), col("dl"))
    val corpusStats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    Bm25Index(postings, df_, corpusStats)
  }

  /** Derive a [[Bm25Index]] from an ALREADY-BUILT positional postings
    * frame ([[positionalPostings]]) instead of paying
    * [[buildBm25Index]]'s second corpus pass + (doc, term) shuffle —
    * for callers that build BOTH structures over the same corpus
    * (phrase-filtered ranking, the bench's sparse serve prebuild). The
    * caller should have the postings frame persisted: the index's three
    * frames and the caller's own phrase probe all read it.
    *
    * Row identity with [[buildBm25Index]] is by construction: tf and dl
    * are PER-DOCUMENT quantities the positional rows already carry
    * exactly (tf = |positions|, dl = |toks| — the [[postingsRowLocal]]
    * argument), df is one vocabulary-sized count over the (term, doc)
    * rows, and the corpus totals re-aggregate doc grain via a first-per-
    * doc reduction of the denormalized dl (exact: dl is constant within
    * a doc). Every field stays the same exact integer, so scores are
    * bit-identical — `Bm25IndexSpec` pins frame-for-frame equality and
    * the untouched q_phrase_ranked oracle pins the composition.
    *
    * PRECONDITION (r19, ADVICE): exactly ONE input row per (term, doc),
    * which [[positionalPostings]] / [[postingsRowLocal]] guarantee by
    * construction (they explode DISTINCT terms per doc). A frame with
    * duplicate (term, doc) rows — e.g. a naive union of two postings
    * frames over overlapping corpora — silently inflates df and
    * n_docs/sum_dl and yields wrong BM25 scores; merge/dedup such input
    * to one row per (term, doc) before calling. */
  def bm25IndexFromPostings(postings: DataFrame): Bm25Index = {
    val p = postings.select(col("term"), col("doc"), col("tf"), col("dl"))
    val df_ = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpusStats = p.groupBy(col("doc")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    Bm25Index(p, df_, corpusStats)
  }

  /** Postings rows (term, doc, tf, dl) computed ROW-LOCALLY — no shuffle,
    * no aggregation state: tf per (doc, term) is a within-row count over
    * the doc's own token array, dl its length. Identical rows to
    * [[buildBm25Index]]'s postings by construction (tf is a per-document
    * quantity), which is what makes the STREAMING index-append twin
    * trivially correct: a stateless map over a micro-batch of new docs
    * emits exactly the batch's postings, no watermark or state store
    * (the [[Pq.servingCodes]] argument applied to the sparse index).
    * Per-row cost is O(distinct terms × tokens) — bounded by document
    * length, not corpus size. */
  def postingsRowLocal(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      Text.tokens(lower(col(textCol))).as("toks"))
    toks.select(col("doc"), size(col("toks")).cast("long").as("dl"),
        explode(array_distinct(col("toks"))).as("term"), col("toks"))
      .select(col("term"), col("doc"),
        size(filter(col("toks"), t => t === col("term")))
          .cast("long").as("tf"),
        col("dl"))
  }

  /** POSITIONAL postings (term, doc, tf, dl, positions) — the full
    * inverted-index row: where [[postingsRowLocal]] records that a term
    * occurs, this also records WHERE (0-based token indexes), which is
    * what phrase queries intersect ([[phraseSearch]]). Still computed
    * ROW-LOCALLY (the token array is zipped with its own index space
    * in-row, then filtered per distinct term), so it shares the
    * streaming-append story: a stateless map over new docs emits exactly
    * their positional postings, no shuffle, no state. Positions are the
    * heavy column (Σ positions == dl per doc vs one tf integer) — the
    * classic inverted-index trade; persist it only when phrase/proximity
    * queries are actually served. */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      Text.tokens(lower(col(textCol))).as("toks"))
    val zipped = toks.select(col("doc"),
      size(col("toks")).cast("long").as("dl"),
      col("toks"),
      zip_with(col("toks"), sequence(lit(0), size(col("toks")) - 1),
        (t, i) => struct(t.as("t"), i.as("i"))).as("ti"))
    zipped.select(col("doc"), col("dl"), col("ti"),
        explode(array_distinct(col("toks"))).as("term"))
      .select(col("term"), col("doc"),
        transform(filter(col("ti"), p => p.getField("t") === col("term")),
          p => p.getField("i")).as("positions"),
        col("dl"))
      .withColumn("tf", size(col("positions")).cast("long"))
      .select(col("term"), col("doc"), col("tf"), col("dl"),
        col("positions"))
  }

  /** PHRASE search against a positional postings index — the classic
    * inverted-index intersection: a phrase [t0 … tm-1] matches doc d at
    * start s iff every ti occurs at position s+i. The algebra: explode
    * the phrase into (offset, term) pairs, probe the postings on term
    * (the batch's terms are pushed as an `IN` literal — same scan
    * pruning as [[searchBm25Served]]), shift each hit's positions back
    * by its offset IN-ROW, and fold an `array_intersect` over the m
    * shifted sets per (query, doc): the intersection IS the match-start
    * set. Every step is exact integer arithmetic, so the whole chain
    * sits under the driver oracle (`q_phrase_search`). Handles repeated
    * phrase terms (offsets are distinct even when terms are not) and
    * any phrase length per query.
    *
    * Scale shape (r16, the positions-last answer to the r15 `weak`):
    * when `dfStats` (the BM25 termStats) marks a query's term
    * selectivities as SKEWED, intersect at doc grain first — (query,
    * doc) pairs whose doc contains every distinct phrase term, computed
    * over the LIGHT (term, doc) projection so the heavy positions
    * column never enters that scan — then explode positions only for
    * intersected candidates; uniform-df queries (and calls without
    * dfStats) keep the direct probe-and-explode plan ([[phraseHits]]
    * has the measured adjudication). The expensive stage stays one
    * codegen'd primitive-key hash aggregate over the exploded
    * (query, doc, start) hits. No
    * DISTINCT machinery rides it — a (query, doc, start, ofs) hit row
    * is unique BY CONSTRUCTION (offsets are distinct within a phrase,
    * and a term's positions within a doc are distinct), so a plain
    * count equals the distinct-offset count; the r15 first cut paid a
    * count_distinct expand here for nothing. An ObjectHashAggregate
    * fold form (collect the m shifted position sets per candidate,
    * array_intersect in-row) was built and MEASURED against the plain
    * aggregate at the ×10/×20/×50 serve points: 6.8/11.9/25.8 s vs
    * 3.7/5.9/25.6 — the codegen primitive aggregate wins; the census
    * (`cand_phrase_*` in the sparse_serve phase) reads the
    * intersection's pruning directly. The corpus text is never read —
    * phrase queries at 100 TB touch only the probed postings rows.
    * Output: (query_id, doc, n_matches), one row per matching doc. */
  def phraseSearch(postings: DataFrame, queries: DataFrame, qidCol: String,
                   qtextCol: String, maxPushTerms: Int = 4096,
                   dfStats: Option[DataFrame] = None): DataFrame = {
    val starts = phraseHits(postings, queries, qidCol, qtextCol,
        maxPushTerms, dfStats)
      .select(col("query_id"), col("m"), col("doc"), col("ofs"),
        explode(col("positions")).as("p"))
      .select(col("query_id"), col("m"), col("doc"), col("ofs"),
        (col("p") - col("ofs")).as("start"))
    starts.groupBy(col("query_id"), col("m"), col("doc"), col("start"))
      .agg(count(lit(1)).as("nofs"))
      .filter(col("nofs") === col("m"))
      .groupBy(col("query_id"), col("doc"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** PROXIMITY (slop) phrase search — the retrieval feature exact
    * adjacency can't express: "these words, near each other, roughly in
    * order". A doc matches with slop `k` iff one position can be chosen
    * per phrase offset whose OFFSET-SHIFTED values (x = position −
    * offset, the same shift [[phraseSearch]] intersects) all fit in a
    * window of width k — i.e. max(x) − min(x) ≤ k over the choice;
    * k = 0 degenerates to the exact phrase. The window-existence test
    * runs on ANCHORS: a shifted window [a, a+k] containing one x per
    * offset exists iff some anchor a FROM THE SHIFTED-HIT SET has every
    * offset represented in [a, a+k] (take a = min of a valid choice and
    * the covering points stay in range; conversely any covered anchor
    * certifies a choice). `n_windows` counts the distinct certifying
    * anchors per (query, doc) — at k = 0 it equals [[phraseSearch]]'s
    * n_matches exactly (spec'd).
    *
    * Semantics note, deliberate and oracle-mirrored: offsets choose
    * positions INDEPENDENTLY, so with repeated phrase terms one token
    * occurrence may serve two offsets whose shifted values both land in
    * the window (interval arithmetic has no token-consumption notion;
    * Lucene's sloppy matcher differs here). Everything is exact integer
    * algebra under the driver oracle (`q_phrase_slop`).
    *
    * Scale shape: the same adaptive positions-last discipline as
    * [[phraseSearch]], then ONE range-window pass over the hits (see
    * the in-body comment for the measured adjudication against the
    * explode-and-join first cut). The corpus text is never read.
    * Output: (query_id, doc, n_windows). */
  def phraseSlopSearch(postings: DataFrame, queries: DataFrame,
                       qidCol: String, qtextCol: String, slop: Int,
                       maxPushTerms: Int = 4096,
                       dfStats: Option[DataFrame] = None): DataFrame = {
    require(slop >= 0 && slop <= 64,
      s"slop must be in [0, 64], got $slop — a wider window stops being " +
        "a proximity query and the (slop+1)-way anchor fan-out stops " +
        "being a constant")
    val hits = phraseHits(postings, queries, qidCol, qtextCol,
        maxPushTerms, dfStats)
      .select(col("query_id"), col("m"), col("doc"), col("ofs"),
        explode(col("positions")).as("p"))
      .select(col("query_id"), col("m"), col("doc"), col("ofs"),
        (col("p") - col("ofs")).as("x"))
    // ONE pass: each hit row IS a potential anchor (a = its x), and its
    // coverage test is a RANGE window frame [x, x+k] within the (query,
    // doc) partition — collect_set(ofs) over the frame holds every
    // offset with a shifted hit in the window, so size == m certifies
    // the anchor. The first cut materialized anchors/cover/semi-join as
    // separate distinct+join stages — four shuffles of (k+1)× the hit
    // volume, measured 73.8 s at the ×50 serve point; this form pays one
    // exchange + sort (the window) and a final small aggregate. Frames
    // are position-list-sized per doc, so per-row set work is bounded by
    // document length, never corpus size. Duplicate x values across
    // offsets compute identical coverage; the final count DISTINCT x
    // keeps anchor identity exact.
    val w = Window.partitionBy(col("query_id"), col("m"), col("doc"))
      .orderBy(col("x")).rangeBetween(Window.currentRow, slop)
    hits.withColumn("nofs",
        size(collect_set(col("ofs")).over(w)).cast("long"))
      .filter(col("nofs") === col("m"))
      .groupBy(col("query_id"), col("doc"))
      .agg(countDistinct(col("x")).as("n_windows"))
  }

  /** The shared front half of [[phraseSearch]] / [[phraseSlopSearch]]:
    * the exploded (query, offset, term) frame joined onto the
    * term-pushed postings probe — with positions still PACKED — plus,
    * where the pre-flight engages, the positions-last DOC-GRAIN
    * CANDIDATE INTERSECTION: (query, doc) pairs whose doc contains
    * EVERY distinct phrase term, computed over the column-pruned
    * (term, doc) projection, so the position explode downstream is paid
    * per true candidate, not per posting of any phrase term.
    *
    * ADAPTIVE, like the WAND pre-flight and for the same measured
    * reason: the intersection is a full extra aggregate over the light
    * postings rows plus a (query, doc) semi-join shuffle, which pays
    * hugely when the phrase's rarest term culls hard (Zipfian text —
    * phrase words rarely co-occur) and pays NOTHING on a uniform
    * vocabulary where most docs contain most phrase words (this
    * fixture: unconditional intersection took the ×50 serve point
    * 13.0 → 24.2 s while pruning only 24% of explode volume —
    * cand_pos_pruned 53.2M of 70.3M). So: with `dfStats` (the BM25
    * termStats, vocabulary-sized) each query is flagged by the same
    * df-spread rule as WAND — rarest df ≤ 10% of the query's Σdf — and
    * only flagged queries' rows pass through the intersection; a batch
    * with no flagged query (or no dfStats at hand) keeps the direct
    * probe-and-explode plan verbatim. Flag ids are collected
    * driver-side (the query batch is the serving contract's small
    * side) and applied as literals, so the split costs no extra join.
    *
    * Queries are DISTINCT'd up front (r15 ADVICE: an exact duplicate
    * query row doubled every plain count and silently dropped all of
    * that query's matches); distinct ids with DIFFERENT text remain
    * the caller's contract, mirroring mergeBm25Index's disjointness
    * note.
    *
    * Two r16 ADVICE fixes ride here: (1) the df spread aggregates over
    * DISTINCT (query_id, term) — qt is per-OFFSET rows, so a repeated
    * phrase term would count its df once per occurrence, inflating sumdf
    * and engaging the intersection on effectively uniform queries (the
    * WAND pre-flight's array_distinct rule, now matched); (2) the
    * flagged-id literals are CAPPED at `maxFlagIds` — the collect is
    * limit-bounded, and a batch flagging more ids than that splits on a
    * broadcast semi/anti-join of the flags frame instead of a
    * plan-bloating giant `isin` (the maxPushTerms escape hatch applied
    * to flags). The flag job itself still runs eagerly at plan
    * construction — plan CHOICE depends on its result; the limit bounds
    * what it can cost the driver. */
  private def phraseHits(postings: DataFrame, queries: DataFrame,
                         qidCol: String, qtextCol: String,
                         maxPushTerms: Int,
                         dfStats: Option[DataFrame],
                         maxFlagIds: Int = 4096): DataFrame = {
    val (qt, probed) =
      phraseProbe(postings, queries, qidCol, qtextCol, maxPushTerms)
    val base = qt.join(probed, Seq("term"))
    dfStats match {
      case None => base
      case Some(stats) =>
        val flagsF = qt.select(col("query_id"), col("term")).distinct()
          .join(stats.select(col("term"), col("df")), Seq("term"))
          .groupBy(col("query_id"))
          .agg(min(col("df")).as("mindf"), sum(col("df")).as("sumdf"))
          .filter(col("mindf").cast("double") <=
            col("sumdf").cast("double") * lit(0.1))
          .select(col("query_id"))
        val flaggedIds = flagsF.limit(maxFlagIds + 1)
          .collect().map(_.get(0)).toSeq
        if (flaggedIds.isEmpty) base
        else if (flaggedIds.size <= maxFlagIds) {
          val isFlagged = col("query_id").isin(flaggedIds: _*)
          val cand = phraseCandidateDocs(qt.filter(isFlagged), probed)
          base.filter(!isFlagged)
            .unionByName(base.filter(isFlagged)
              .join(cand, Seq("query_id", "doc"), "left_semi"))
        } else {
          val flags = broadcast(flagsF)
          val cand = phraseCandidateDocs(
            qt.join(flags, Seq("query_id"), "left_semi"), probed)
          base.join(flags, Seq("query_id"), "left_anti")
            .unionByName(base.join(flags, Seq("query_id"), "left_semi")
              .join(cand, Seq("query_id", "doc"), "left_semi"))
        }
    }
  }

  /** The query tokenization + term-pushed probe shared by every phrase
    * entry point (and the census). */
  private def phraseProbe(postings: DataFrame, queries: DataFrame,
                          qidCol: String, qtextCol: String,
                          maxPushTerms: Int): (DataFrame, DataFrame) = {
    val qt = queries.select(col(qidCol).as("query_id"),
        col(qtextCol).as("qtext")).distinct()
      .select(col("query_id"), Text.tokens(lower(col("qtext"))).as("qtoks"))
      .select(col("query_id"), size(col("qtoks")).cast("long").as("m"),
        posexplode(col("qtoks")))
      .select(col("query_id"), col("m"), col("pos").as("ofs"),
        col("col").as("term"))
    val pushTerms = qt.select(col("term")).distinct()
      .limit(maxPushTerms + 1).collect().map(_.getString(0)).toSeq
    val probed =
      if (pushTerms.size > maxPushTerms) postings
      else postings.filter(col("term").isin(pushTerms: _*))
    (qt, probed)
  }

  /** Doc-grain AND-intersection of the phrase's distinct terms: one
    * (query, term, doc) join over the LIGHT (term, doc) projection of
    * the postings, counted against the query's distinct-term total.
    * Exposed for the bench's candidate-volume census. */
  private[graft] def phraseCandidateDocs(qt: DataFrame,
                                         probed: DataFrame): DataFrame = {
    val qdist = qt.select(col("query_id"), col("term")).distinct()
    val mdist = qdist.groupBy(col("query_id"))
      .agg(count(lit(1)).as("m_distinct"))
    qdist.join(probed.select(col("term"), col("doc")), Seq("term"))
      .groupBy(col("query_id"), col("doc"))
      .agg(count(lit(1)).as("n_terms"))
      .join(mdist, Seq("query_id"))
      .filter(col("n_terms") === col("m_distinct"))
      .select(col("query_id"), col("doc"))
  }

  /** The (query_id, doc) candidate pairs the positions-last intersection
    * admits (unconditional — the census instrument: count these against
    * the raw Σdf candidate volume to read the intersection's pruning,
    * whether or not the pre-flight would engage it). */
  def phraseCandidates(postings: DataFrame, queries: DataFrame,
                       qidCol: String, qtextCol: String,
                       maxPushTerms: Int = 4096): DataFrame = {
    val (qt, probed) =
      phraseProbe(postings, queries, qidCol, qtextCol, maxPushTerms)
    phraseCandidateDocs(qt, probed)
  }

  /** Merge two [[Bm25Index]]es built over DISJOINT document sets into
    * the index a single build over the union would produce — EXACTLY
    * (postings and dl are per-doc; df and the corpus totals are
    * additive over disjoint doc sets; everything is BIGINT). The
    * incremental-ingest path: `merge(existing, buildBm25Index(batch))`
    * costs one pass over the batch plus a vocabulary-keyed stats
    * aggregate; the existing postings never reshuffle (union is
    * partition-preserving). Disjointness is the caller's contract — a
    * doc present in both sides would double its postings rows and skew
    * df/dl, silently; dedupe the batch against the index's doc ids
    * first (a left_anti on the postings' doc column) if unsure. */
  def mergeBm25Index(a: Bm25Index, b: Bm25Index): Bm25Index = {
    val postings = a.postings.unionByName(b.postings)
    val termStats = a.termStats.unionByName(b.termStats)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val corpusStats = a.corpusStats.unionByName(b.corpusStats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    Bm25Index(postings, termStats, corpusStats)
  }

  /** The SAFE append entry: drop batch docs already in the index (one
    * left_anti against the index's doc ids — at-least-once ingestion
    * replays a batch without double-counting), build the survivors'
    * index, merge. This wraps [[mergeBm25Index]]'s disjointness contract
    * so callers cannot violate it: `append(append(idx, b), b) ==
    * append(idx, b)` exactly (spec'd), the idempotence property every
    * at-least-once pipeline needs. */
  def appendBm25Index(existing: Bm25Index, batch: DataFrame, idCol: String,
                      textCol: String): Bm25Index = {
    val known = existing.postings.select(col("doc")).distinct()
    // dedupe WITHIN the batch too (r15 ADVICE): an at-least-once source
    // can replay a doc inside one batch just as easily as across batches,
    // and a doubled doc would double postings, df and the corpus totals.
    // Rows sharing an id are interchangeable under the id contract (same
    // doc), so dropDuplicates' arbitrary pick is safe.
    val fresh = batch.dropDuplicates(Seq(idCol))
      .join(known, batch(idCol) === known("doc"), "left_anti")
    mergeBm25Index(existing, buildBm25Index(fresh, idCol, textCol))
  }

  /** Persist a [[Bm25Index]] as three catalog tables under `prefix` —
    * postings bucketed by `term` (the serving join key: the pushed
    * term literals then prune buckets at the scan, PlanAuditSpec) and
    * the two stats tables plain. One call instead of the three ad-hoc
    * writes the bench prebuild used to carry; [[loadBm25Index]] is the
    * inverse, and serving over a round-tripped index is bit-identical
    * to serving the in-memory build (spec'd). */
  def saveBm25Index(index: Bm25Index, prefix: String, buckets: Int): Unit = {
    import graft.sources.Sinks
    // grouped staged swap (Sinks.replaceTables): an appended index's
    // termStats/corpusStats plans read the PREVIOUS postings table, so
    // all three stages must write while every old table is still live —
    // this is what makes save(append(load(p), batch), p) onto the same
    // prefix safe end-to-end (SinksSpec's self-referential test)
    Sinks.replaceTables(index.postings.sparkSession, Seq(
      s"${prefix}_postings" ->
        Sinks.bucketedWriter(index.postings, Seq("term"), buckets),
      s"${prefix}_termstats" -> Sinks.parquetWriter(index.termStats),
      s"${prefix}_corpusstats" -> Sinks.parquetWriter(index.corpusStats)))
  }

  /** Re-open a persisted [[Bm25Index]] written by [[saveBm25Index]].
    * Rolls forward a swap that crashed mid-rename first
    * (Sinks.recoverSwaps — the marker certifies complete stages), so a
    * mixed old/new table set is repaired before it can serve one
    * stale-statistics score. */
  def loadBm25Index(spark: org.apache.spark.sql.SparkSession,
                    prefix: String): Bm25Index = {
    graft.sources.Sinks.recoverSwaps(spark, Seq(s"${prefix}_postings",
      s"${prefix}_termstats", s"${prefix}_corpusstats"))
    Bm25Index(spark.table(s"${prefix}_postings"),
      spark.table(s"${prefix}_termstats"),
      spark.table(s"${prefix}_corpusstats"))
  }

  /** Persist a POSITIONAL postings frame ([[positionalPostings]]) as the
    * phrase-serving table — term-bucketed like the plain postings (the
    * probe key; the pushed term literals prune buckets at the scan).
    * The [[saveBm25Index]] symmetry call for deployments that serve
    * phrase/proximity queries; [[loadPositionalIndex]] is the inverse. */
  def savePositionalIndex(postings: DataFrame, prefix: String,
                          buckets: Int): Unit =
    graft.sources.Sinks.bucketedTableOn(postings, s"${prefix}_positional",
      Seq("term"), buckets)

  /** Re-open a persisted positional index written by
    * [[savePositionalIndex]], ready for [[phraseSearch]] /
    * [[phraseSlopSearch]]. */
  def loadPositionalIndex(spark: org.apache.spark.sql.SparkSession,
                          prefix: String): DataFrame =
    spark.table(s"${prefix}_positional")

  /** APPEND documents to a positional index (r17 — completes the phrase
    * index's lifecycle beside the BM25 and ANN quads: build / serve /
    * append / delete). Positional postings are PER-DOC row-local
    * quantities ([[positionalPostings]] scaladoc) — no cross-doc
    * statistics exist to maintain — so append over disjoint doc sets is
    * a plain union and equals a full rebuild over the union EXACTLY.
    * The [[appendBm25Index]] safety contract is wrapped on: the batch
    * dedupes within itself and anti-joins the index's doc ids, so
    * at-least-once replay is idempotent (`append(append(idx, b), b) ==
    * append(idx, b)` row-for-row, spec'd and driver-checked). Cost: one
    * map-only pass over the SURVIVING batch docs plus a doc-id
    * distinct — the existing postings never reshuffle. */
  def appendPositionalIndex(existing: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val known = existing.select(col("doc")).distinct()
    val fresh = batch.dropDuplicates(Seq(idCol))
      .join(known, batch(idCol) === known("doc"), "left_anti")
    existing.unionByName(positionalPostings(fresh, idCol, textCol))
  }

  /** DELETE documents from a positional index — and unlike
    * [[deleteBm25Index]] there are NO statistics to fix (phrase
    * intersection reads only the matching docs' own position lists), so
    * deletion is one anti-join at tombstone grain: `delete(build(all),
    * tombs) == build(all minus tombs)` EXACTLY, and deleting absent ids
    * is a no-op. The corpus text is never touched. */
  def deletePositionalIndex(existing: DataFrame, tombstones: DataFrame,
                            idCol: String): DataFrame =
    existing.join(tombstones.select(col(idCol).as("doc")).distinct(),
        Seq("doc"), "left_anti")
      // the join moves its key first; restore the canonical postings order
      .select(col("term"), col("doc"), col("tf"), col("dl"),
        col("positions"))

  /** DELETE documents from a [[Bm25Index]] — the remaining quarter of
    * the sparse lifecycle (build / serve / append / delete), and unlike
    * the ANN side's tombstone exclusion this must TOUCH THE STATISTICS:
    * removing a doc changes df for every term it contained and the
    * corpus totals BM25 normalizes by, so a stats-blind tombstone
    * anti-join would keep scoring the survivors with stale weights. The
    * deltas come from the index itself — the deleted docs' own postings
    * rows give exact per-term df decrements and per-doc lengths — so
    * deletion never touches the corpus text and
    * `delete(build(all), tombs) == build(all minus tombs)` EXACTLY,
    * component by component (all BIGINTs; spec'd, and
    * `q_bm25_index_delete` driver-checks serving over the deleted index
    * against the oracle's full rebuild over the remaining corpus).
    * Idempotent: deleting ids already gone is a no-op (their postings
    * rows no longer exist, so every delta is zero). Cost: one semi/anti
    * pass over the postings at tombstone-join grain plus a
    * vocabulary-sized stats aggregate — never a corpus rebuild. */
  def deleteBm25Index(index: Bm25Index, tombstones: DataFrame,
                      idCol: String): Bm25Index = {
    val tombs = tombstones.select(col(idCol).as("doc")).distinct()
    val removed = Caches.tracked(
      index.postings.join(tombs, Seq("doc"), "left_semi"), "tfidf")
    // the join moves its key first; restore the canonical postings order
    val kept = index.postings.join(tombs, Seq("doc"), "left_anti")
      .select(col("term"), col("doc"), col("tf"), col("dl"))
    val dfDelta = removed.groupBy(col("term"))
      .agg(count(lit(1)).as("ddf"))
    val termStats = index.termStats.join(dfDelta, Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    // one (doc, dl) row per removed doc (dl rides every posting row)
    val removedDocs = removed.groupBy(col("doc")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("dn"), sum(col("dl")).as("dsum"))
    val corpusStats = index.corpusStats.crossJoin(removedDocs)
      .select((col("n_docs") - col("dn")).as("n_docs"),
        (col("sum_dl") - coalesce(col("dsum"), lit(0L))).as("sum_dl"))
    Bm25Index(kept, termStats, corpusStats)
  }

  /** BM25 serving against a pre-built [[Bm25Index]] — bit-identical
    * output to [[searchBm25]] over the same corpus (same exact-integer
    * inputs, same IEEE weight chain, same order-free fixed-point sum),
    * but the timed work is ONLY: explode the query strings, join the
    * (tiny) query-term set against the postings table, score, heap-rank.
    * The corpus text is never read. Scale shape: the query side is
    * queries × terms rows — Catalyst broadcasts it unhinted — AND the
    * batch's distinct terms are collected (driver-bounded ephemera, the
    * codebook-literal discipline) into an `IN` literal on the postings
    * scan, because a broadcast join by itself prunes NOTHING at the
    * scan: only a literal predicate reaches parquet as a PushedFilter
    * and prunes buckets/row groups before a single posting is read
    * (PlanAuditSpec pins both). The filter is on the join key, so
    * results are unchanged; batches with a vocabulary above
    * `maxPushTerms` skip the push (an IN list that big stops being a
    * cheap footer check) and fall back to the plain probe. Output:
    * (query_id, doc, score_c, rank). */
  def searchBm25Served(index: Bm25Index, queries: DataFrame, qidCol: String,
                       qtextCol: String, k: Int = 5, k1: Double = 1.2,
                       b: Double = 0.75, maxPushTerms: Int = 4096,
                       candidates: Option[DataFrame] = None,
                       wandPrune: Boolean = false): DataFrame = {
    val scored = servedWeights(index, queries, qidCol, qtextCol, k, k1, b,
        maxPushTerms, candidates, wandPrune)
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(col("w_c")).as("score_c"))
    Ranking.topKByScore(scored, "query_id", "doc", "score_c", k)
  }

  /** The shared serving core: the per-(query, term, doc) fixed-point
    * weight frame, plus — when WAND pruning applies — the admitted
    * (query, doc) candidate set the final aggregate is restricted to.
    *
    * WAND/MaxScore EARLY TERMINATION (r16, the builder-named residual;
    * Broder et al. CIKM'03, the MaxScore family): most candidate docs of
    * a disjunctive top-k query cannot reach the k-th best score, and an
    * upper bound per query term proves it without scoring them. The
    * set-oriented form here (document-at-a-time pointer walks don't
    * exist in a scan-based engine) is a THREE-STEP exact prune over ONE
    * persisted weight frame — the postings are scanned once, exactly as
    * before:
    *
    *  1. SEED a lower bound θ on the true k-th score: fully score the
    *     docs of each query's RAREST term (fewest postings — the
    *     cheapest non-trivial candidate set with the highest-signal
    *     term) and take the k-th seed score. A k-th best over a SUBSET
    *     of docs can only understate the true k-th, so θ is a certified
    *     lower bound.
    *  2. Per-term upper bounds from the frame itself: ub(q, t) =
    *     max(w_c) over the term's actual probed postings — an exact
    *     integer, no float monotonicity hazard, and valid under any
    *     append/delete (a precomputed termStats-side bound would need
    *     exact max-maintenance on every index mutation).
    *  3. ESSENTIAL terms: sort each query's terms by rising ub; the
    *     longest prefix with cumulative Σub < θ (strict) is
    *     NON-ESSENTIAL — a doc containing only those terms scores
    *     ≤ Σub < θ ≤ true k-th, so it cannot enter the top-k even on
    *     ties. Admitted docs = docs matching at least one essential
    *     term; the final aggregate and heap rank run over those alone.
    *
    * Every quantity is an exact BIGINT (the fixed-point w_c discipline),
    * every exclusion is strict-inequality-certified, so the pruned
    * result is IDENTICAL to the unpruned one — `q_bm25_served`'s oracle
    * is unchanged and `Bm25IndexSpec` asserts pruned == unpruned row-
    * for-row on corpora engineered to prune. Queries with fewer than k
    * seed docs get no θ and skip pruning (correct, no gain); an
    * explicit `candidates` frame (the phrase-ranked path) already
    * prunes harder and bypasses WAND.
    *
    * ADAPTIVE PRE-FLIGHT (the jaccard pair-budget discipline applied to
    * pruning): WAND only pays when term selectivities are SKEWED — a
    * rare high-bound term to seed a tight θ and common low-bound terms
    * to rule non-essential. A query whose terms all carry similar df
    * (the uniform-vocabulary worst case) gets a θ that certifies almost
    * nothing while the seed pass re-scores most of the candidate set:
    * MEASURED on the 31-word synthetic fixture at the ×50 serve point,
    * forced-on WAND was 20.6 s vs 7.5 s unpruned with only 12% of rows
    * pruned. So each query is flagged from termStats alone — prune iff
    * its rarest term's df ≤ `wandSeedFrac` (default 0.1) of its Σdf —
    * and the machinery runs ONLY over flagged queries' rows (a mixed
    * batch splits, serves each half its own way, and unions before the
    * rank; a batch with no flagged query plans the r15 pipeline
    * verbatim — the flag decision costs one LIMIT-BOUNDED driver job of
    * at most maxFlagIds+1 rows beside the pushTerms collect, the r17
    * ADVICE bound). The refusal is by name in
    * the bench census
    * (`bm25_wand_pruned_queries` = 0 on this fixture — uniform df is
    * the printed reason). Cost shape when engaged: the weight frame
    * persists once (it was the aggregate's input anyway); seeds add one
    * rarest-term-sized aggregate; the win is the final (query, doc)
    * aggregate + rank shrinking from every-candidate to admitted-only
    * (`bm25_wand_*` census fields).
    *
    * DEFAULT OFF — the full adjudication (r16, the `wand_skew` bench
    * instrument): even on a MAXIMALLY favorable skewed query set (every
    * query led by the corpus's rarest term; 52/52 queries flagged, 92%
    * of weight rows pruned), the engaged path measured 5.6 vs 1.5 s at
    * ×10 and 12.5 vs 2.9 s at ×50 — summing w_c through the single
    * codegen hash aggregate is so cheap per row that the multi-pass set
    * algebra (persist + ub aggregate + seed scoring + essential window
    * + admitted distinct + semi-join) costs more than every row it
    * removes. Exact row-level pruning cannot beat this engine's
    * aggregate without scan-level skipping, which exact scoring forbids
    * (admitted docs still need their non-essential postings). The
    * machinery stays available (`wandPrune = true`), exact and spec'd,
    * and the instrument keeps publishing both timings per round so a
    * workload where the trade flips (very large k, wide score payloads,
    * candidate sets that spill the aggregate) shows up in the artifact
    * rather than in an assumption. */
  private def servedWeights(index: Bm25Index, queries: DataFrame,
                            qidCol: String, qtextCol: String, k: Int,
                            k1: Double, b: Double, maxPushTerms: Int,
                            candidates: Option[DataFrame],
                            wandPrune: Boolean,
                            wandSeedFrac: Double = 0.1): DataFrame = {
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(Text.tokens(lower(col(qtextCol))))).as("term"))
    val needFlags = wandPrune && candidates.isEmpty
    // EVERY driver collect here is limit-bounded (r17 ADVICE): the
    // pushTerms job caps at maxPushTerms+1 rows on every path, and the
    // WAND pre-flight's flag decision below caps at maxFlagIds+1 — the
    // phraseHits rule. The r16 form fused flags+terms into one unbounded
    // qstats collect (saving ~0.3-0.6 s of job scheduling on the WAND
    // path); that pulled every query's term SET to the driver with no
    // cap, which is exactly the bound-less collect the maxFlagIds cap
    // exists to prevent. Two small bounded jobs on the default-OFF WAND
    // path beat one unbounded one.
    val pushTerms =
      qterms.select(col("term")).distinct()
        .limit(maxPushTerms + 1).collect().map(_.getString(0)).toSeq
    val postings =
      if (pushTerms.size > maxPushTerms) index.postings
      else index.postings.filter(col("term").isin(pushTerms: _*))
    val avgdl = index.corpusStats.select(
      (col("sum_dl").cast("double") / col("n_docs").cast("double"))
        .as("avgdl"))
    val satTf = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val probed = qterms.join(index.termStats, Seq("term"))
      .join(postings, Seq("term"))
    // candidate PRE-filter (the sparse twin of Pq.ivfPqServe's candPred,
    // same semantics argument): restricting (query_id, doc) pairs BEFORE
    // scoring keeps the output the true BM25 top-k among admitted docs —
    // post-filtering an unfiltered top-k starves as selectivity grows.
    // The candidate frame is (query_id, doc) pairs — e.g. phraseSearch's
    // matches for "exact phrase, ranked by relevance" — joined while the
    // frame is still per-term rows, so the aggregate shrinks too.
    val admitted = candidates.fold(probed)(c =>
      probed.join(c.select(col("query_id"), col("doc")).distinct(),
        Seq("query_id", "doc"), "left_semi"))
    val weightedRaw = admitted
      .crossJoin(broadcast(avgdl))
      .select(col("query_id"), col("term"), col("df"), col("doc"),
        floor(satTf / col("df").cast("double") * lit(1048576.0d))
          .cast("long").as("w_c"))
    if (!needFlags) return weightedRaw
    // the pre-flight (class doc): queries whose df spread says pruning
    // can pay — an empty flag set short-circuits to the exact r15 plan,
    // no persist, no join. The flag collect is LIMIT-BOUNDED at
    // maxFlagIds+1 (r17 ADVICE): the driver learns whether the batch
    // exceeds the literal cap without ever pulling more than cap+1 ids,
    // exactly as phraseHits does.
    val maxFlagIds = 4096
    val flagsF = qterms
      .join(index.termStats.select(col("term"), col("df")), Seq("term"))
      .groupBy(col("query_id"))
      .agg(min(col("df")).as("mindf"), sum(col("df")).as("sumdf"))
      .filter(col("mindf").cast("double") <=
        col("sumdf").cast("double") * lit(wandSeedFrac))
      .select(col("query_id"))
    val flaggedIds = flagsF.limit(maxFlagIds + 1).collect().map(_.get(0)).toSeq
    if (flaggedIds.isEmpty) return weightedRaw
    // flagged-id literal cap (r16 ADVICE, the phraseHits rule): a batch
    // flagging more than maxFlagIds ids splits on a broadcast semi/anti
    // of the flags frame instead of a plan-bloating isin. The giant
    // literal is only CONSTRUCTED on the literal path (r17 ADVICE — the
    // unconditional form built the expression the cap exists to avoid).
    val useLiterals = flaggedIds.size <= maxFlagIds
    def semiFlag(df: DataFrame): DataFrame =
      if (useLiterals) df.filter(col("query_id").isin(flaggedIds: _*))
      else df.join(broadcast(flagsF), Seq("query_id"), "left_semi")
    def antiFlag(df: DataFrame): DataFrame =
      if (useLiterals) df.filter(!col("query_id").isin(flaggedIds: _*))
      else df.join(broadcast(flagsF), Seq("query_id"), "left_anti")
    // persisted: the frame feeds ub, seed scoring, the admitted set
    // AND the final aggregate — four readers of one postings scan
    val weighted = Caches.tracked(weightedRaw, "tfidf")
    val wFlagged = semiFlag(weighted)
    // (1) θ: k-th full score over the rarest term's docs
    val seedW = Window.partitionBy(col("query_id"))
      .orderBy(col("df"), col("term"))
    val seedTerm = wFlagged.select(col("query_id"), col("term"), col("df"))
      .distinct()
      .withColumn("rn", row_number().over(seedW)).filter(col("rn") === 1)
      .select(col("query_id"), col("term"))
    val seedDocs = wFlagged.join(seedTerm, Seq("query_id", "term"),
      "left_semi").select(col("query_id"), col("doc"))
    val thetaW = Window.partitionBy(col("query_id"))
      .orderBy(col("score_c").desc, col("doc"))
    val theta = wFlagged.join(seedDocs, Seq("query_id", "doc"), "left_semi")
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(col("w_c")).as("score_c"))
      .withColumn("rn", row_number().over(thetaW))
      .filter(col("rn") === k)
      .select(col("query_id"), col("score_c").as("theta"))
    // (2)+(3) essential terms under exact per-term max-weight bounds
    val cumW = Window.partitionBy(col("query_id"))
      .orderBy(col("ub_c"), col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val essential = wFlagged.groupBy(col("query_id"), col("term"))
      .agg(max(col("w_c")).as("ub_c"))
      .withColumn("cum_ub", sum(col("ub_c")).over(cumW))
      .join(theta, Seq("query_id"), "left")
      .filter(col("theta").isNull || col("cum_ub") >= col("theta"))
      .select(col("query_id"), col("term"))
    val wandDocs = wFlagged.join(essential, Seq("query_id", "term"),
        "left_semi")
      .select(col("query_id"), col("doc")).distinct()
    // unflagged queries' rows pass straight to the aggregate — they never
    // pay the admitted semi-join's (query, doc) shuffle; flagged queries
    // keep only rows of docs matching at least one essential term
    antiFlag(weighted)
      .unionByName(wFlagged.join(wandDocs, Seq("query_id", "doc"),
        "left_semi"))
  }

  /** Census instrument for the bench's sparse_serve phase: (candidate
    * weight rows without pruning, rows entering the final aggregate with
    * WAND, queries the adaptive pre-flight flagged for pruning) for the
    * same serve call [[searchBm25Served]] would run. full == pruned with
    * 0 flagged queries is the pre-flight refusing by name (uniform df). */
  def bm25WandCensus(index: Bm25Index, queries: DataFrame, qidCol: String,
                     qtextCol: String, k: Int = 5, k1: Double = 1.2,
                     b: Double = 0.75): (Long, Long, Long) = {
    val full = servedWeights(index, queries, qidCol, qtextCol, k, k1, b,
      4096, None, wandPrune = false).count()
    val pruned = servedWeights(index, queries, qidCol, qtextCol, k, k1, b,
      4096, None, wandPrune = true).count()
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(Text.tokens(lower(col(qtextCol))))).as("term"))
    val nFlagged = qterms.join(index.termStats, Seq("term"))
      .groupBy(col("query_id"))
      .agg(min(col("df")).as("mindf"), sum(col("df")).as("sumdf"))
      .filter(col("mindf").cast("double") <=
        col("sumdf").cast("double") * lit(0.1))
      .count()
    (full, pruned, nFlagged)
  }
}
