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
}
