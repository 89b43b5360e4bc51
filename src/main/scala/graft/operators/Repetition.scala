package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-quality metrics for training-corpus filtering — the
  * MassiveText/Gopher family (duplicate n-gram fraction, most-frequent
  * n-gram character fraction) that public web-scale pipelines apply before
  * dedup proper.
  *
  * Shape at scale: MAP-ONLY. Every metric here is a function of a single
  * document, so nothing ever leaves the row: all four statistics come from
  * ONE pass of the native [[graft.plans.RepetitionStats]] expression over
  * the token array (the composed shingle-array + `array_distinct` +
  * [[graft.plans.TopGram]] form survives as [[ngramRepetitionComposed]],
  * its property-test twin). The original corpus-wide formulation
  * ([[ngramRepetitionShuffled]], also kept as a spec twin)
  * exploded every uni/bi/trigram occurrence into `(doc, n, gram)` rows and
  * hash-aggregated across the cluster — mostly-distinct grams defeat
  * map-side combine, so the full token stream (×3 gram orders, string
  * keys) hit the exchange: the round-3 sf1 bench measured 60× cost at 10×
  * data. The in-row form is trivially linear and shuffle-free.
  */
object Repetition {

  /** Per-document repetition metrics:
    *
    *  - `n_tokens` / `n_distinct_tokens` — unigram totals;
    *  - `top_bigram`, `top_bigram_count` — the most frequent word 2-gram
    *    (ties broken by lexicographically smallest gram, so the result is
    *    deterministic and engine-portable);
    *  - `top_bigram_char_frac` — chars covered by occurrences of that
    *    2-gram over total document chars (Gopher's "top n-gram character
    *    fraction" filter signal);
    *  - `dup_trigram_frac` — fraction of 3-gram occurrences that are
    *    repeats of an earlier occurrence (Gopher's "duplicate n-gram"
    *    signal): `(total − distinct) / total`, exactly `sum(c−1)/sum(c)`
    *    of the per-gram counts.
    *
    * Documents shorter than the gram order degenerate to one whole-text
    * shingle (same convention as [[Text.shinglesFromTokens]]).
    */
  def ngramRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Token array gets its own projection boundary: Catalyst does not CSE
    // across lambda boundaries, so inlining the split would re-run it per
    // consumer (see Text.shinglesFromTokens scaladoc). All four statistics
    // come from ONE pass of the native expression — no shingle arrays, no
    // array_distinct rescans (the composed twin below paid both).
    val base = docs.select(
      col(idCol).as("doc"),
      length(col(textCol)).cast("long").as("n_chars"),
      Text.tokens(lower(col(textCol))).as("toks"))
    base
      .select(col("doc"), col("n_chars"),
        graft.plans.RepetitionStats.repetitionStats(col("toks")).as("rs"))
      .select(col("doc").as(idCol),
        col("rs.n_tokens").as("n_tokens"),
        col("rs.n_distinct_tokens").as("n_distinct_tokens"),
        col("rs.top_bigram").as("top_bigram"),
        col("rs.top_bigram_count").as("top_bigram_count"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise((col("rs.top_bigram_count") * length(col("rs.top_bigram")))
            .cast("double") / col("n_chars").cast("double"))
          .as("top_bigram_char_frac"),
        col("rs.dup_trigram_frac").as("dup_trigram_frac"))
  }

  /** Composed in-row twin: identical semantics built from shingle arrays +
    * `array_distinct` + [[graft.plans.TopGram]] — what the single-pass
    * native expression replaced (it byte-copied every bi/trigram via
    * `array_join` and hash-scanned the arrays twice). Kept for the
    * property suite asserting native ≡ composed on generated corpora. */
  private[graft] def ngramRepetitionComposed(docs: DataFrame, idCol: String,
                                             textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc"),
      length(col(textCol)).cast("long").as("n_chars"),
      Text.tokens(lower(col(textCol))).as("toks"))
    val arrs = base.select(col("doc"), col("n_chars"), col("toks"),
      Text.shinglesFromTokens(col("toks"), 2).as("bis"),
      Text.shinglesFromTokens(col("toks"), 3).as("tris"))
    arrs
      .select(col("doc"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        graft.plans.TopGram.topGram(col("bis")).as("tb"),
        ((size(col("tris")) - size(array_distinct(col("tris")))).cast("double")
          / size(col("tris")).cast("double")).as("dup_trigram_frac"))
      .select(col("doc").as(idCol),
        col("n_tokens"), col("n_distinct_tokens"),
        col("tb.gram").as("top_bigram"),
        col("tb.cnt").as("top_bigram_count"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise((col("tb.cnt") * length(col("tb.gram"))).cast("double")
            / col("n_chars").cast("double"))
          .as("top_bigram_char_frac"),
        col("dup_trigram_frac"))
  }

  /** Spec twin: the explode + corpus-wide hash-agg formulation the in-row
    * default replaced — kept so `TextHygieneSpec` can assert frame-level
    * equivalence of the two algorithms. Do NOT use on large corpora: it
    * shuffles every n-gram occurrence for per-document outputs. */
  private[graft] def ngramRepetitionShuffled(docs: DataFrame, idCol: String,
                                             textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc"),
      length(col(textCol)).cast("long").as("n_chars"),
      Text.tokens(lower(col(textCol))).as("toks"))
    val tagged = base
      .select(col("doc"), col("n_chars"),
        explode(concat(
          transform(col("toks"),
            g => struct(lit(1).as("n"), g.as("g"))),
          transform(Text.shinglesFromTokens(col("toks"), 2),
            g => struct(lit(2).as("n"), g.as("g"))),
          transform(Text.shinglesFromTokens(col("toks"), 3),
            g => struct(lit(3).as("n"), g.as("g"))))).as("t"))
      .select(col("doc"), col("n_chars"),
        col("t.n").as("n"), col("t.g").as("g"))
    val counts = tagged.groupBy("doc", "n", "g")
      .agg(count(lit(1)).as("c"), any_value(col("n_chars")).as("n_chars"))
    val uni = counts.filter(col("n") === 1).groupBy("doc").agg(
      any_value(col("n_chars")).as("n_chars"),
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("n_distinct_tokens"))
    // min_by over (-count, gram): highest count first, then smallest gram —
    // a deterministic argmax without a per-doc window sort.
    val bi = counts.filter(col("n") === 2).groupBy("doc").agg(
      min_by(col("g"), struct((-col("c")).as("nc"), col("g").as("g")))
        .as("top_bigram"),
      max(col("c")).cast("long").as("top_bigram_count"))
    val tri = counts.filter(col("n") === 3).groupBy("doc").agg(
      (sum(col("c") - 1).cast("double") / sum(col("c")).cast("double"))
        .as("dup_trigram_frac"))
    uni.join(bi, Seq("doc")).join(tri, Seq("doc"))
      .select(col("doc").as(idCol),
        col("n_tokens"), col("n_distinct_tokens"),
        col("top_bigram"), col("top_bigram_count"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise((col("top_bigram_count") * length(col("top_bigram")))
            .cast("double") / col("n_chars").cast("double"))
          .as("top_bigram_char_frac"),
        col("dup_trigram_frac"))
  }
}
