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
}
