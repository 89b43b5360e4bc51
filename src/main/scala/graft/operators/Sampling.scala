package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample`/`sampleBy` are seeded but partition-layout-dependent and
  * engine-specific — re-running after a repartition, or recomputing the
  * split in another system, changes membership. Everything here derives
  * membership from a content hash of the ROW ID (md5, so any engine can
  * recompute it): splits are stable under repartitioning, joins, engine
  * swaps, and incremental re-runs — the property that actually matters
  * when the "test" split must stay held out for the lifetime of a model.
  *
  * The reference's `--sample-size` is an honest random sample at
  * acquisition ([[graft.Analyze.collect]]); these are the engine's
  * reproducible-pipeline forms.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's md5 (first 8 hex chars →
    * 32-bit int → mod). Portable: any engine with md5 reproduces it. */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Stable train/val/test assignment. Fractions are in basis points of
    * 10000 buckets: e.g. (1000, 1000) → 10% val, 10% test, 80% train. */
  def split(df: DataFrame, idCol: String,
            valBp: Int = 1000, testBp: Int = 1000): DataFrame = {
    val b = hashBucket(col(idCol), 10000)
    df.withColumn("split",
      when(b < valBp, "val")
        .when(b < valBp + testBp, "test")
        .otherwise("train"))
  }

  /** Train/val/test LEAKAGE AUDIT — the near-dup pairs whose endpoints
    * landed in DIFFERENT splits: every such pair is evaluation
    * contamination (a test document whose near-copy was trained on
    * inflates the benchmark), and a split cut by [[split]]'s per-doc
    * hash CANNOT avoid it — hash splitting is independent of content,
    * so each near-dup cluster scatters across splits. The audit is the
    * step a real pipeline runs BEFORE training: either re-cut the split
    * along component keep-lists (dedup first, split after) or drop the
    * flagged eval docs.
    *
    * `pairs` = any near-dup pair frame (jaccard/minhash/simhash/
    * containment output: `aCol`, `bCol`, carried score columns pass
    * through); `splits` = ([[split]]'s) (id, split) assignment.
    *
    * COVERAGE: endpoints are joined LEFT, and a pair with any endpoint
    * missing from `splits` is EMITTED with a null `split_a`/`split_b` —
    * for a contamination audit, silently under-reporting because the
    * caller's split was computed over a filtered corpus would be the
    * worst failure mode, so missing coverage is made visible instead of
    * swallowed. Callers wanting the strict flagged-leakage set filter
    * `split_a IS NOT NULL AND split_b IS NOT NULL` themselves (with full
    * coverage the output is exactly the differing-split pairs either
    * way).
    *
    * Scale shape: `pairs` is already bounded by the dedup budget; the
    * assignment frame is two thin columns, and both joins shuffle on
    * the id key only (or broadcast when the pair set is small) — no
    * text moves. */
  def splitLeakage(pairs: DataFrame, splits: DataFrame,
                   idCol: String = "doc_id",
                   aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val sa = splits.select(col(idCol).as(aCol), col("split").as("split_a"))
    val sb = splits.select(col(idCol).as(bCol), col("split").as("split_b"))
    // null-propagating =!= drops null comparisons; the coalesce keeps
    // them — an uncovered endpoint surfaces rather than vanishing
    pairs.join(sa, Seq(aCol), "left").join(sb, Seq(bCol), "left")
      .filter(coalesce(col("split_a") =!= col("split_b"), lit(true)))
  }

  /** Per-stratum deterministic sample: keep a row iff its hash bucket
    * falls under the stratum's rate (basis points of 10000). Strata
    * missing from `ratesBp` are dropped — the training-data shape
    * ("keep 100% of rare languages, 5% of English"). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesBp: Map[String, Int]): DataFrame = {
    val rate = ratesBp.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 10000) < rate)
  }

  /** DuckDB twin of [[hashBucket]] for oracle SQL. */
  def duckdbHashBucketSql(idCol: String, buckets: Int): String =
    s"(('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8))::BIGINT % $buckets)"

  /** Deterministic global shuffle + shard assignment — the
    * "shuffle the corpus before packing batches" step of a training
    * pipeline, without `ORDER BY rand()`'s two sins (not reproducible, and
    * a single global sort). Every row gets a seeded content-hash shuffle
    * key; `shard` is a hash bucket of that key and `pos` the row's rank
    * within its shard by the same key — so the (shard, pos) order is a
    * reproducible pseudo-random permutation, any engine can recompute it,
    * and changing `seed` yields an independent epoch order.
    *
    * Scale shape: the window partitions by `shard`, so each shard sorts
    * independently — parallelism = `shards`, no global sort, no skew
    * (md5 spreads uniformly). Downstream writers consume shards as
    * independent files/tasks. */
  def globalShuffle(df: DataFrame, idCol: String, shards: Int,
                    seed: Int = 0): DataFrame = {
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** DuckDB twin of [[globalShuffle]]'s key for oracle SQL. */
  def duckdbShuffleKeySql(idCol: String, seed: Int): String =
    s"md5($seed || ':' || CAST($idCol AS VARCHAR))"

  /** Per-group quota: keep at most `n` rows per group, selected by the
    * deterministic md5 order of the row id — a reproducible "random n per
    * source" that any engine recomputes identically (same property story
    * as [[hashBucket]]). The per-source cap of a data-mixing recipe
    * ("at most 100k docs from any single domain"), one shuffle on the
    * group key — ranked by [[Ranking.keepSmallestKIds]]'s bounded heap
    * (r13 heap; r14 thin form), so a mega-domain's rows collapse to n in
    * map-side partials instead of feeding one task's sort, and ONLY
    * (group, md5, id) entries ever enter the aggregation buffer — the
    * caller's payload (full text, maps, anything non-orderable) stays
    * out of the heap and rejoins by id, so `df`'s columns are
    * unconstrained. `idCol` must be unique across `df` (it is the row
    * identity the payload rejoins on). */
  def groupCap(df: DataFrame, idCol: String, groupCol: String, n: Int): DataFrame =
    Ranking.keepSmallestKIds(df, groupCol,
      Seq(md5(concat(lit("cap:"), col(idCol).cast("string"))), col(idCol)),
      idCol, n)

  /** Temperature-weighted mixture sampling — the data-mixing step of an
    * LLM training pipeline: draw from source s at a rate ∝ n_s^α with
    * α = 0.5, so rare sources are upweighted relative to their raw share
    * (the GPT-3/Pile mixing shape). `targetRows` sets the expected total;
    * a source whose proportional share exceeds its size is kept whole
    * (rate capped at 1).
    *
    * Determinism across engines, so the sampled corpus is reproducible
    * bit-for-bit anywhere:
    *  - α is fixed at 0.5 because IEEE-754 `sqrt` is correctly rounded in
    *    every engine, unlike `pow(n, α)` whose libm varies by platform;
    *  - the weight is scaled to an exact integer (`floor(sqrt(n)·2^20)`)
    *    so the cross-source total is an order-free BIGINT sum, not a
    *    float sum whose value depends on aggregation order;
    *  - the per-source rate is a fixed left-associated chain of correctly
    *    rounded double ops, identical in any IEEE engine;
    *  - membership is the same portable md5-bucket rule as
    *    [[stratifiedSample]].
    *
    * Scale shape: one tiny per-source aggregate (|sources| rows), rates
    * broadcast back, membership a map-only filter — no corpus shuffle. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    targetRows: Long): DataFrame = {
    val counts = df.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w_int",
        floor(sqrt(col("n_s").cast("double")) * lit(1048576.0)).cast("long"))
    val tot = counts.agg(sum(col("w_int")).as("w_tot"))
    val rates = counts.crossJoin(tot)
      .select(col("src"),
        least(lit(10000.0),
          lit(10000.0) * lit(targetRows.toDouble) * col("w_int").cast("double")
            / col("w_tot").cast("double") / col("n_s").cast("double"))
          .as("rate_bp"))
    df.join(broadcast(rates), col(sourceCol) === col("src"))
      .filter(hashBucket(col(idCol), 10000).cast("double") < col("rate_bp"))
      .drop("src", "rate_bp")
  }

  /** DSIR-style target-distribution data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw doc by how target-like its hashed n-gram profile is
    * — per-bucket importance ratios between a small TARGET corpus (the
    * distribution you want more of) and the RAW corpus — and keep the
    * top `n`. The hashed-feature trick is the paper's: n-grams collapse
    * into `buckets` hash buckets, so both "distributions" are
    * fixed-size histograms regardless of vocabulary.
    *
    * Portability (the [[mixtureSample]] discipline): DSIR's
    * Σ log(p_t/p_r) is a transcendental sum — last-ulp libm variance AND
    * order-dependent float addition. Here each bucket's importance ratio
    * (add-one smoothed) is ONE correctly rounded double division scaled
    * to fixed point — `floor((tc+1)·(T_r+B) / ((rc+1)·(T_t+B)) · 2^20)`,
    * exact-integer-valued doubles in, BIGINT out — so a doc's score is
    * an order-free integer sum of per-gram bucket affinities, normalized
    * by integer division. Arithmetic-mean-of-ratios rather than the
    * paper's geometric mean: the same "upweight target-typical grams"
    * signal, bit-reproducible in any IEEE engine; exact bucket counts
    * are emitted by the histogram so a downstream consumer can apply
    * the true log formula where cross-engine parity doesn't matter.
    *
    * Scale shape: two histogram aggregates bounded by `buckets` rows,
    * ratio table broadcast back to the raw gram stream (map-side join),
    * per-doc partial aggregation collapses each doc before the one
    * O(docs) shuffle, and the top-n is a TakeOrdered — no global sort,
    * the corpus never shuffles whole rows. The target corpus is re-read
    * once for its histogram only.
    *
    * The raw tokenize+shingle+bucket pass DELIBERATELY runs twice (raw
    * histogram + scoring join) rather than persisting the exploded
    * (id, bucket) frame once: the cached variant measured ~25% SLOWER
    * at sf0.1 under matched calibration (A/B/A, r11) — same verdict as
    * [[graft.operators.Familiarity]]'s duplicated tokenize: caching a
    * row-exploded frame costs more than recomputing the codegen'd
    * map-only kernel. Do not re-apply the tfidf/jaccard persist here;
    * that lesson is for frames whose RECOMPUTE crosses an exchange.
    *
    * Output: (id, n_grams, score) for the selected docs, score =
    * per-gram mean affinity in 2^-20 units. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, n: Int, buckets: Int = 256,
                 gramN: Int = 2): DataFrame = {
    import graft.functions.Text
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(Text.shinglesFromTokens(
        Text.tokens(lower(col(textCol))), gramN)).as("gram"): _*)
    def bucketOf(g: Column): Column = hashBucket(g, buckets)
    val tHist = grams(target).groupBy(bucketOf(col("gram")).as("bucket"))
      .agg(count(lit(1)).as("tc"))
    val rGrams = grams(raw, col(idCol))
    val rHist = rGrams.groupBy(bucketOf(col("gram")).as("bucket"))
      .agg(count(lit(1)).as("rc"))
    val tTot = tHist.agg(coalesce(sum(col("tc")), lit(0L)).as("t_tot"))
    val rTot = rHist.agg(coalesce(sum(col("rc")), lit(0L)).as("r_tot"))
    // domain = buckets present in raw (only those are ever looked up);
    // target-absent buckets smooth to tc=0
    val ratio = rHist
      .join(tHist, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        floor((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double")
            * (col("r_tot") + lit(buckets.toLong)).cast("double")
          / ((col("rc") + lit(1L)).cast("double")
            * (col("t_tot") + lit(buckets.toLong)).cast("double"))
          * lit(1048576.0)).cast("long").as("affinity"))
    rGrams.select(col(idCol), bucketOf(col("gram")).as("bucket"))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("affinity")).as("aff_sum"))
      // integral division (not `/` + cast: that routes through a double,
      // which loses exactness once aff_sum nears 2^53 on huge docs)
      .select(col(idCol), col("n_grams"),
        expr("aff_sum div n_grams").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
  }

  /** DuckDB twin of [[mixtureSample]] for oracle SQL: same integer-scaled
    * sqrt weights, same op order, same md5 bucket rule. */
  def duckdbMixtureSampleSql(table: String, idCol: String, sourceCol: String,
                             targetRows: Long, selectCols: String): String =
    s"""WITH counts AS (
       |  SELECT $sourceCol AS src, count(*) AS n_s,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1048576.0) AS BIGINT) AS w_int
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(w_int) AS BIGINT) AS w_tot FROM counts),
       |rates AS (
       |  SELECT src,
       |    least(10000.0, 10000.0 * ${targetRows.toDouble} * CAST(w_int AS DOUBLE)
       |      / CAST(w_tot AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate_bp
       |  FROM counts, tot)
       |SELECT $selectCols FROM $table d JOIN rates r ON d.$sourceCol = r.src
       |WHERE CAST(${duckdbHashBucketSql(s"d.$idCol", 10000)} AS DOUBLE) < r.rate_bp""".stripMargin
}
