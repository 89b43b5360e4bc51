package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed document quality gate — the C4/Gopher-style keep/drop decision
  * a training pipeline runs before dedup, with per-rule REASONS so drops
  * are auditable (the difference between a filter you can tune and one you
  * can only rerun).
  *
  * Entirely map-only: every signal is a per-row Column expression (the
  * token array materialized once per row — lambda-CSE rule), no shuffle
  * anywhere, so the pass streams at scan speed over 100 TB and composes
  * with partition pruning for free. Thresholds follow the published
  * Gopher/C4 heuristics but are all parameters.
  */
object QualityFilter {

  /** Thresholds; names follow the emitted reason strings. */
  final case class Config(
      minTokens: Long = 10L,
      maxTokens: Long = 100000L,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      maxPunctRatio: Double = 0.20,
      minStopwordRatio: Double = 0.01,
      minAlphaRatio: Double = 0.60,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr"))

  /** Per-document verdict: id, the five signals, `reasons` (violated rule
    * names, fixed construction order) and `keep`. */
  def apply(docs: DataFrame, idCol: String, textCol: String, langCol: String,
            cfg: Config = Config()): DataFrame = {
    val base = docs.select(col(idCol), col(langCol).as("lang_tag"),
      col(textCol).as("txt"),
      Text.tokens(col(textCol)).as("toks"))
    val sig = base.select(
      col(idCol), col("lang_tag"),
      size(col("toks")).cast("long").as("n_tokens"),
      (aggregate(transform(col("toks"), t => length(t)), lit(0L),
        (acc, x) => acc + x.cast("long")).cast("double") /
        greatest(size(col("toks")).cast("double"), lit(1.0d))).as("mean_word_len"),
      (Text.punctCount(col("txt")).cast("double") /
        greatest(length(col("txt")).cast("double"), lit(1.0d))).as("punct_ratio"),
      Text.stopwordRatio(col("txt")).as("stopword_ratio"),
      // single-char class ⇒ count = chars removed; regexp_extract_all here
      // would allocate one array element PER LETTER of every document
      ((length(col("txt")) - length(regexp_replace(col("txt"), "[A-Za-z]", "")))
        .cast("double") /
        greatest(length(col("txt")).cast("double"), lit(1.0d))).as("alpha_ratio"))
    val reasons = array_compact(array(
      when(col("n_tokens") < cfg.minTokens, lit("too_few_tokens")),
      when(col("n_tokens") > cfg.maxTokens, lit("too_many_tokens")),
      when(col("mean_word_len") < cfg.minMeanWordLen
        || col("mean_word_len") > cfg.maxMeanWordLen, lit("mean_word_len")),
      when(col("punct_ratio") > cfg.maxPunctRatio, lit("high_punct_ratio")),
      when(col("stopword_ratio") < cfg.minStopwordRatio, lit("low_stopword_ratio")),
      when(col("alpha_ratio") < cfg.minAlphaRatio, lit("low_alpha_ratio")),
      when(not(col("lang_tag").isInCollection(cfg.allowedLangs)), lit("lang_not_allowed"))))
    sig.withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
      .drop("lang_tag")
  }

  /** CORPUS-RELATIVE length filter: keep documents whose token count lies
    * within the corpus's own [lo, hi] percentile band — the complement of
    * the fixed-threshold gate above (fixed bounds misfire when the corpus
    * mix shifts; a percentile band adapts per ingest).
    *
    * Scale shape: thresholds come from ONE tiny aggregate (`percentile`
    * is a single-pass exact interpolated quantile, same value as DuckDB's
    * `quantile_cont`), broadcast back as a 1-row cross join — the corpus
    * itself never shuffles, so the pass is scan-speed like the gate.
    *
    * The scale trade in that aggregate (r16 VERDICT): EXACT `percentile`
    * buffers every distinct value per partition — its memory is
    * data-dependent, the one aggregate shape in the engine that is. Here
    * the buffered domain is TOKEN COUNTS (bounded by the longest
    * document, thousands of distinct values at any corpus size), so
    * exact is safe at 100 TB and keeps the oracle bit-exact. For
    * unbounded-domain columns set `approx = true`: `approx_percentile`'s
    * QuantileSummaries sketch is fixed-memory with a certified rank
    * error ≤ 1/accuracy — a band boundary may then shift by at most that
    * rank mass (`q_quantiles_approx` carries the self-check oracle
    * pattern for exactly this substitution). */
  def lengthBand(docs: DataFrame, idCol: String, textCol: String,
                 lo: Double = 0.01, hi: Double = 0.99,
                 approx: Boolean = false,
                 accuracy: Int = 10000): DataFrame = {
    val counts = docs.select(col(idCol),
      Text.tokenCount(col(textCol)).as("n_tokens"))
    def pct(p: Double, as: String) =
      if (approx) expr(s"approx_percentile(n_tokens, $p, $accuracy)")
        .cast("double").as(as)
      else expr(s"percentile(n_tokens, $p)").as(as)
    val bounds = counts.agg(pct(lo, "lo_tokens"), pct(hi, "hi_tokens"))
    counts.crossJoin(broadcast(bounds))
      .withColumn("keep",
        col("n_tokens") >= col("lo_tokens") && col("n_tokens") <= col("hi_tokens"))
  }
}
