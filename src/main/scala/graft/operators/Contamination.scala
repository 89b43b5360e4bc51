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
  * explode + broadcast-hash join + per-doc hash-agg. The corpus is never
  * shuffled by shingle and nothing is pairwise — cost is O(corpus tokens)
  * plus the broadcast.
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
    def shingled(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), Text.tokens(lower(col(textCol))).as("toks"))
        .select(col(outId), explode(Text.shinglesFromTokens(col("toks"), n)).as("g"))
        .distinct()
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
