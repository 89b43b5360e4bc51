package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing: grouping documents into fixed-token-budget packs for
  * LLM training batches. Two forms with the usual exact/scalable split:
  *
  *  - [[chunked]]: capacity-chunked assignment via a running-sum window —
  *    pack = floor(preceding-tokens / seqLen) within a shard. Fully
  *    declarative (one window over shard-partitioned data), deterministic,
  *    SQL-portable (oracle-checked); a document may straddle a boundary,
  *    which real pipelines absorb as truncation/padding.
  *  - [[greedy]]: exact first-fit-in-order packing (no pack exceeds the
  *    budget unless a single document does) — inherently sequential per
  *    shard, so it runs as per-partition imperative logic after a shard
  *    repartition: the documented last-resort `mapPartitions` tier, used
  *    here because a running-capacity scan is genuinely order-carrying.
  *
  * Shards bound the sequential span: each shard packs independently, so
  * parallelism = shards regardless of corpus size.
  */
object Packing {

  /** Declarative capacity-chunked packing. Output: input + (shard, pack_id).
    * pack_id is globally unique: shard * 2^32 + chunk. */
  def chunked(docs: DataFrame, idCol: String, tokensCol: String,
              seqLen: Int, shards: Int): DataFrame = {
    val shard = pmod(col(idCol), lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", shard)
      .withColumn("_prior",
        coalesce(sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L)))
      .withColumn("pack_id",
        col("shard") * (1L << 32) + floor(col("_prior") / seqLen).cast("long"))
      .drop("_prior")
  }

  /** Sliding context-window chunk spans per document: starts at
    * 0, stride, 2·stride, … while < `tokensCol`, each chunk covering
    * `[start, min(start+seqLen, n))` — the overlap-chunking step that
    * prepares long documents for a fixed context window (stride < seqLen
    * gives overlapping windows; stride == seqLen gives disjoint ones).
    *
    * MAP-ONLY: the fan-out is an in-row `explode(sequence(...))` over the
    * token COUNT — no shuffle, no token materialization, trivially linear
    * at any corpus size. `seqLen >= stride` guarantees every token is
    * covered. `chunk_idx = start/stride` exactly (starts are multiples of
    * stride), so no window function is needed for the index either.
    * Output: input + (chunk_idx, start_tok, n_in_chunk); zero-token
    * documents produce no chunks. */
  def slidingChunks(docs: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    require(seqLen >= stride, "seqLen < stride would leave token gaps")
    docs.filter(col(tokensCol) > 0)
      .withColumn("start_tok",
        explode(sequence(lit(0L), col(tokensCol).cast("long") - 1L,
          lit(stride.toLong))))
      .withColumn("chunk_idx", (col("start_tok") / stride).cast("long"))
      .withColumn("n_in_chunk",
        least(lit(seqLen.toLong), col(tokensCol).cast("long") - col("start_tok")))
  }

  /** Exact greedy first-fit-in-order packing per shard. Output schema:
    * input + (shard, pack_id); same global pack_id convention. */
  def greedy(docs: DataFrame, idCol: String, tokensCol: String,
             seqLen: Int, shards: Int): DataFrame = {
    val withShard = docs.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
    val outSchema = StructType(withShard.schema.fields :+
      StructField("pack_id", LongType, nullable = false))
    val tokIdx = withShard.schema.fieldIndex(tokensCol)
    val shardIdx = withShard.schema.fieldIndex("shard")
    // Row-level mapPartitions on the sorted frame (a partition may hold
    // several shards; reset capacity on shard change).
    val sorted = withShard.repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    val rdd = sorted.rdd.mapPartitions { rows =>
      var curShard = -1L
      var used = seqLen.toLong + 1 // forces a new pack on first row (no overflow)
      var pack = -1L
      rows.map { r =>
        val s = r.getLong(shardIdx)
        val t = r.getLong(tokIdx)
        if (s != curShard) { curShard = s; used = seqLen.toLong + 1; pack = -1L }
        if (used + t > seqLen) { pack += 1L; used = 0L }
        used += t
        Row.fromSeq(r.toSeq :+ (s * (1L << 32) + pack))
      }
    }
    sorted.sparkSession.createDataFrame(rdd, outSchema)
  }
}
