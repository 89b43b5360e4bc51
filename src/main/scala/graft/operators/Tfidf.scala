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
  * top-k via a window partitioned on doc. The df join-back carries NO
  * broadcast hint on purpose: a natural-language vocabulary fits under
  * the auto-broadcast threshold and Catalyst broadcasts it unhinted,
  * but a web-scale token vocabulary does not bound (the same reason
  * [[Familiarity]] uses a shuffled equi-join) — a forced hint would
  * bypass the threshold safety exactly when it matters. The corpus
  * itself never broadcasts and never sorts globally. */
object Tfidf {

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
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
  }
}
