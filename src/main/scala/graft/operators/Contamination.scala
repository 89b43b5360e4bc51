package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents that share
  * long word n-grams with a (small) held-out benchmark set — the
  * decontamination step public LLM pipelines run before training (13-gram
  * overlap in GPT-3's data work; we parameterize n).
  *
  * Shape at scale: the benchmark side is tiny relative to the corpus, so
  * its distinct shingles broadcast; the corpus side streams through one
  * explode + broadcast-hash join + per-doc hash-agg. Per-document shingle
  * dedup happens IN-ROW (`array_distinct` before the explode — an earlier
  * `.distinct()` formulation shuffled every corpus n-gram string for it:
  * 199 MB at the ×10 scale point, ~0 after), so the corpus is never
  * shuffled by shingle and nothing is pairwise — the only exchange left
  * carries the matched (contaminated) rows into the per-doc agg. Cost is
  * O(corpus tokens) plus the broadcast.
  */
object Contamination {

  /** Documents of `corpus` sharing ≥1 word n-gram with any `bench` doc.
    *
    * Returns one row per contaminated corpus doc:
    * (idCol, n_shared_shingles, n_bench_docs) — how many distinct shingles
    * overlap and how many distinct benchmark documents are hit.
    */
  def overlap(corpus: DataFrame, bench: DataFrame,
              idCol: String, textCol: String, n: Int = 8): DataFrame = {
    // per-doc distinct in-row; shingle arrays at their own projection
    // boundary (lambda-CSE trap — see Text.shinglesFromTokens scaladoc)
    def shingled(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), Text.tokens(lower(col(textCol))).as("toks"))
        .select(col(outId), Text.shinglesFromTokens(col("toks"), n).as("gs"))
        .select(col(outId), explode(array_distinct(col("gs"))).as("g"))
    // no cross-doc distinct on either side. In-row dedup makes every
    // (id, g) pair unique WHEN idCol is unique per input row (the normal
    // corpus contract); if a caller feeds duplicate ids, the join emits
    // duplicate (doc, g, bench_id) rows — harmless here because BOTH
    // output aggregates are count_distinct, which absorbs them (the
    // result equals the old cross-row `.distinct()` form either way).
    // Any future plain count() added to this agg would break under
    // duplicate ids — re-add a distinct first if so.
    val benchSh = shingled(bench, "bench_id")
    val corpusSh = shingled(corpus, "doc")
    corpusSh.join(broadcast(benchSh), Seq("g"))
      .groupBy("doc")
      .agg(count_distinct(col("g")).as("n_shared_shingles"),
        count_distinct(col("bench_id")).as("n_bench_docs"))
      .select(col("doc").as(idCol),
        col("n_shared_shingles"), col("n_bench_docs"))
  }
}
