package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency familiarity scoring — the deterministic core of the
  * LM-based quality filters public web-scale pipelines run (CCNet-style:
  * score each document by how "familiar" its tokens are to the corpus;
  * documents dominated by rare/garbled tokens score low and get filtered
  * or down-mixed). Instead of an external language model, the corpus is
  * its own model: per-token corpus frequency, aggregated per document.
  * Exact integer counts + a final ratio keep it engine-portable (the
  * oracle recomputes it bit-equal), unlike log-probability scores whose
  * transcendental math differs across engines.
  *
  * Scale shape: the token stream is evaluated on BOTH branches
  * (vocabulary count + frequency join) — deliberately. Exchange reuse
  * does NOT collapse the second scan (self-referenced subtrees get
  * re-aliased attribute ids at analysis; measured: zero Reused* nodes in
  * the final adaptive plan), but the repeated work is a map-only
  * codegen'd tokenize whose vocab branch shuffles only map-combined
  * per-token partials; the alternative — pre-aggregating to persisted
  * (doc, token, count) rows and joining those — pays a whole extra
  * exchange and measured 48% SLOWER with 2.4× the shuffle bytes at
  * sf0.1 (unlike [[Tfidf]], whose duplicated branch repeats a full
  * pre-shuffle aggregate and does win from the persist). No broadcast of
  * the vocabulary: at web scale the long tail makes the vocab itself
  * large, so the join stays a shuffled equi-join by design.
  */
object Familiarity {

  /** Per-document familiarity metrics:
    *  - `n_tokens` — occurrence count;
    *  - `sum_tf` — summed corpus frequency of each occurrence;
    *  - `avg_token_freq` — mean corpus frequency (high = stereotypical
    *    text, low = rare-token-dense text);
    *  - `n_hapax` — occurrences whose token appears exactly once in the
    *    whole corpus (garbled/unique-string density signal).
    */
  def tokenFamiliarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(lower(col(textCol)))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("tf"))
    tok.join(vocab, Seq("token"))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("tf")).as("sum_tf"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("avg_token_freq",
        col("sum_tf").cast("double") / col("n_tokens").cast("double"))
      .select(col("doc").as(idCol), col("n_tokens"), col("sum_tf"),
        col("n_hapax"), col("avg_token_freq"))
  }
}
