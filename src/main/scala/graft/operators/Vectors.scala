package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector utilities for training-data pipelines: L2
  * normalization, per-group centroids, and int8 scalar quantization —
  * the storage/compute reductions applied to embedding columns before
  * clustering, ANN indexing, or shipping vectors to a feature store.
  *
  * All three are expressed as pure Column plans (no UDFs): per-row work
  * is higher-order array functions over the vector, cross-row work is
  * decomposable hash-aggs.
  *
  * Determinism at scale: float centroids computed with `avg` are
  * partition-order-dependent (double addition is not associative), so the
  * "same" job on a re-partitioned 100 TB corpus yields drifting centroids
  * run to run. [[centroids]] therefore accumulates in exact fixed-point
  * (bigint), which is associative — byte-identical results under ANY
  * partitioning, executor count, or AQE re-plan, and identical across
  * engines. 2^20 scaling keeps |x| ≤ ~8·10^12 per element before sum, so
  * ~10^6 vectors per group fit a bigint with 10^5× headroom.
  */
object Vectors {

  /** Sum of squares as an in-order double fold (matches a row-local
    * sequential reduction in any engine). */
  private def sumSq(v: Column): Column =
    aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2-normalize: (id, l2_norm, unit vector). Bit-portable with NO
    * rounding: the sum of squares is a left-to-right fold (`aggregate`
    * here, `list_reduce` in the oracle — the 0-seed is exact, so both
    * folds produce identical doubles), and every later step is one
    * identical IEEE op.
    *
    * The norm is materialized in its own projection before the transform
    * lambda — Catalyst does not CSE across lambda boundaries, so an
    * inlined norm would re-run the O(dim) fold per element (O(dim²)). */
  def normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("l2_norm", sqrt(sumSq(col("v"))))
      .select(col(idCol), col("l2_norm"),
        transform(col("v"), x => x.cast("double") / col("l2_norm"))
          .as("unit_vec"))

  /** Per-group element-wise mean in exact fixed-point: each element is
    * floored to `scaleBits` binary places, summed exactly as bigint
    * (associative → deterministic), and divided back once at the end.
    *
    * Shape at scale: posexplode fans rows ×dim, but the (group, pos)
    * hash-agg partial-aggregates map-side, so the exchange carries
    * groups×dim rows — independent of corpus size. Output:
    * (groupCol, n_vectors, centroid: array<double>). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String,
                scaleBits: Int = 20): DataFrame = {
    val scale = math.pow(2, scaleBits)
    df.select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum(floor(col("col").cast("double") * scale)).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(any_value(col("n")).cast("long").as("n_vectors"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("ss"))
      .select(col(groupCol), col("n_vectors"),
        transform(col("ss"),
          e => e.getField("s").cast("double") / col("n_vectors").cast("double") / scale)
          .as("centroid"))
  }

  /** Int8-style scalar quantization per vector: q_i = floor((x_i − min) /
    * step + 0.5) with step = (max − min)/255, plus the exact
    * reconstruction error bound max_i |x_i − (min + q_i·step)|.
    *
    * Every output is bit-portable without rounding: min/max are exact
    * float picks, the per-element arithmetic is an identical IEEE double
    * expression in any engine, and max (unlike a sum) is order-independent.
    * Constant vectors (step = 0) quantize to all-zeros with zero error.
    *
    * Storage story at 100 TB: 64 float32 dims → 64 bytes + two floats,
    * a 3.8× cut on the dominant column before ANN bucketing. */
  /** Feature-hashed bag of words — the "hashing trick" (Weinberger et al.
    * 2009, arXiv:0902.2206): a fixed-`dim` SIGNED-count vector straight
    * from the token stream, no vocabulary pass, no dictionary to ship.
    * bucket = md5(token) mod dim; sign = parity of the 9th md5 nibble
    * (the signed variant keeps inner products unbiased). The text → vector
    * bridge: its output feeds [[centroids]], [[Dedup.semanticDedup]], or
    * ANN without a model.
    *
    * Entirely map-only, and every output is an exact BIGINT — no floats
    * anywhere — so the vectors are bit-identical in any engine (the md5
    * bucket rule is [[Sampling.hashBucket]]'s, inlined to keep the token
    * hash one expression).
    *
    * The (bucket, sign) structs get their own projection boundary AND the
    * second select references `bs` twice (n_tokens + the fold) — both
    * deliberate: Catalyst inlines single-referenced non-cheap aliases
    * into lambdas, which would re-run the md5 pass once per output
    * dimension (the [[Text.shinglesFromTokens]] trap). */
  def hashedBow(docs: DataFrame, idCol: String, textCol: String,
                dim: Int = 32): DataFrame = {
    import graft.functions.Text
    docs.select(col(idCol),
      Text.tokens(lower(col(textCol))).as("toks"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        graft.plans.HashedBow.hashedBow(col("toks"), dim).as("vec"))
  }

  /** Spec twin of [[hashedBow]]: the composable transform × aggregate
    * nest the native expression replaced — O(dim·L) interpreted CaseWhen
    * steps per document (22 s at sf0.1 vs one md5 per token). Kept so
    * `TfidfFeatureSpec` can assert bit-equality of the two forms. */
  private[graft] def hashedBowComposable(docs: DataFrame, idCol: String,
                                         textCol: String, dim: Int): DataFrame = {
    import graft.functions.Text
    val bs = docs.select(col(idCol),
      transform(Text.tokens(lower(col(textCol))), t => struct(
        (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % dim).as("b"),
        when(conv(substring(md5(t), 9, 1), 16, 10).cast("long") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("s"))).as("bs"))
    bs.select(col(idCol),
      size(col("bs")).cast("long").as("n_tokens"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        aggregate(col("bs"), lit(0L), (acc, x) =>
          acc + when(x.getField("b") === j.cast("long"), x.getField("s"))
            .otherwise(lit(0L)))).as("vec"))
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("vmin", array_min(col("v")).cast("double"))
      .withColumn("vmax", array_max(col("v")).cast("double"))
      .withColumn("step", (col("vmax") - col("vmin")) / lit(255.0d))
      .withColumn("q",
        when(col("step") === 0.0d,
          transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => floor((x.cast("double") - col("vmin")) / col("step") + 0.5d))))
      .withColumn("max_abs_err",
        when(col("step") === 0.0d, lit(0.0d))
          .otherwise(array_max(zip_with(col("v"), col("q"),
            (x, q) => abs(x.cast("double") - (col("vmin") + q.cast("double") * col("step")))))))
      .select(idCol, "vmin", "vmax", "step", "q", "max_abs_err")
}
