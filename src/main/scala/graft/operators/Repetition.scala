package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-quality metrics for training-corpus filtering — the
  * MassiveText/Gopher family (duplicate n-gram fraction, most-frequent
  * n-gram character fraction) that public web-scale pipelines apply before
  * dedup proper.
  *
  * Shape at scale: ONE explode producing (doc, n, gram) rows tagged with
  * the n-gram order, a (doc, n, gram) hash-count, then per-doc rollups —
  * every step is a decomposable hash-agg keyed by the doc, so partial
  * aggregation collapses the gram fan-out map-side and nothing is
  * quadratic in document length (the naive per-doc `filter(grams, g = x)`
  * counting form is O(tokens²) per document and is deliberately avoided).
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
    *    signal).
    *
    * Documents shorter than the gram order degenerate to one whole-text
    * shingle (same convention as [[Text.shinglesFromTokens]]).
    */
  def ngramRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Token array gets its own projection boundary: Catalyst does not CSE
    // across lambda boundaries, so inlining the split would re-run it per
    // shingle (see Text.shinglesFromTokens scaladoc).
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
        (col("top_bigram_count") * length(col("top_bigram"))).cast("double")
          ./(col("n_chars").cast("double")).as("top_bigram_char_frac"),
        col("dup_trigram_frac"))
  }
}
