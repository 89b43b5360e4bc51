package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `ArrayType(FloatType)` embedding columns,
  * expressed with Spark's higher-order array functions (codegen'd,
  * no UDFs). All math is carried out in double precision left-to-right,
  * which matches DuckDB's list_* functions on DOUBLE[] exactly — so the
  * oracle can verify cosine similarities bit-for-bit after rounding.
  */
object Vectors {
  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine against a precomputed pair of (dot-ready) norm columns — lets a
    * top-k join compute each side's norm once instead of per pair. */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Deterministic pseudo-random hyperplane component for LSH: hash the
    * (plane, dim) pair to a value in [-1, 1). Replaces an RNG so bucket
    * assignment is stable across runs/sessions — the property the engine
    * actually needs (SURVEY.md §7.4 #2 analog for vectors). `seed` selects
    * an independent hyperplane family (one per LSH table). */
  def hyperplaneComponent(plane: Int, dim: Column, seed: Int = 0): Column = {
    val h = if (seed == 0) xxhash64(lit(plane), dim) // seed-0 form kept bit-stable
            else xxhash64(lit(seed), lit(plane), dim)
    (pmod(h, lit(2000001L)).cast("double") / lit(1000000.0)) - lit(1.0)
  }

  /** Sign-random-projection bucket id: `planes` hyperplanes → one bit each,
    * packed into a long. Vectors in the same bucket are ANN candidates.
    * Scaling a vector by any positive factor leaves every projection sign
    * unchanged, so collinear vectors land in the same bucket in EVERY
    * seeded table — the recall guarantee the dedup path builds on.
    *
    * Default path is the native [[graft.plans.SrpBucket]] expression
    * (hyperplanes precomputed once per JVM, one FMA loop per row); the
    * composable form below is its bit-equivalence spec twin
    * (`SimilaritySpec`), same convention as simhash. */
  def srpBucket(vec: Column, planes: Int, seed: Int = 0): Column =
    graft.plans.SrpBucket.srpBucket(vec, planes, seed)

  /** Multi-probe sequence for the QUERY side of an SRP search: own bucket
    * plus the `probes−1` lowest-margin single-bit flips
    * ([[graft.plans.SrpProbes]]). Probe 0 is always [[srpBucket]]'s value. */
  def srpProbes(vec: Column, planes: Int, probes: Int, seed: Int = 0): Column =
    graft.plans.SrpBucket.srpProbes(vec, planes, probes, seed)

  /** Spec twin of [[srpBucket]] — the same bucket id via higher-order
    * column functions only. */
  def srpBucketComposable(vec: Column, planes: Int, seed: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(d(vec), sequence(lit(0), size(vec) - 1),
          (x, i) => x * hyperplaneComponent(p, i, seed)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
