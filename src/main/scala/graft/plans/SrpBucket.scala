package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-random-projection LSH bucket id for an embedding vector: `planes`
  * pseudo-random hyperplanes → one sign bit each, packed into a long.
  *
  * Bit-equivalent to the composable form
  * ([[graft.functions.Vectors.srpBucketComposable]]): hyperplane component
  * (p, i) is `pmod(xxhash64([seed,] p, i), 2000001)/1e6 − 1` and the
  * projection is the same left-to-right double fold. The composable form
  * evaluates that xxhash64 expression tree per (element × plane) — for
  * 64-dim × 40 planes that is 2 560 hash-expression evaluations and 80
  * array materializations per ROW. Here the hyperplane matrix is computed
  * once per JVM per (planes, seed, dim) with direct XXH64 calls and the
  * row cost collapses to planes×dim fused multiply-adds in one loop.
  */
case class SrpBucket(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpBucket.compute(input.asInstanceOf[ArrayData], planes, seed, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SrpBucket.compute($c, $planes, $seed, $floatElems)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** Multi-probe companion of [[SrpBucket]]: the query-side probe sequence
  * — the vector's own bucket plus the buckets reached by flipping the
  * `probes−1` LOWEST-MARGIN sign bits (planes whose projection magnitude
  * is smallest, i.e. where the vector sits closest to the hyperplane and
  * a true neighbor most plausibly landed on the other side). Classic
  * multi-probe LSH: recall rises toward multi-table levels while the
  * corpus side keeps exactly ONE bucket per row and the join shape is
  * unchanged — only the (broadcast) query side fans out ×probes. */
case class SrpProbes(child: Expression, planes: Int, seed: Int, probes: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")
  require(probes >= 1 && probes <= planes + 1,
    "probes must be in [1, planes + 1] (single-bit flips)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_probes"

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpBucket.computeProbes(input.asInstanceOf[ArrayData], planes, seed,
      floatElems, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SrpBucket.computeProbes($c, $planes, $seed, $floatElems, $probes)")

  override protected def withNewChildInternal(newChild: Expression): SrpProbes =
    copy(child = newChild)
}

object SrpBucket {

  /** Hyperplane matrices are deterministic functions of (planes, seed,
    * dim) — cached per JVM, keyed exactly by that triple. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** Same value chain as the composable `xxhash64` column: Spark's
    * multi-arg xxhash64 folds args left-to-right from seed 42, hashing
    * int args with hashInt; the seed-0 family omits the seed arg (its
    * historical bit-stable form). */
  private def hyperplanes(planes: Int, seed: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((planes, seed, dim), _ => {
      val arr = new Array[Double](planes * dim)
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dim) {
          var h = 42L
          if (seed != 0) h = XXH64.hashInt(seed, h)
          h = XXH64.hashInt(p, h)
          h = XXH64.hashInt(i, h)
          val m = ((h % 2000001L) + 2000001L) % 2000001L
          arr(p * dim + i) = m.toDouble / 1000000.0 - 1.0
          i += 1
        }
        p += 1
      }
      arr
    })

  def compute(vec: ArrayData, planes: Int, seed: Int, floatElems: Boolean): Long = {
    val dim = vec.numElements()
    val hp = hyperplanes(planes, seed, dim)
    var sig = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        val x = if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * hp(base + i)
        i += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** [[compute]] variant that also keeps per-plane projections and emits
    * the probe sequence: own bucket first, then single-bit flips in
    * ascending |projection| order (ties by plane index — deterministic). */
  def computeProbes(vec: ArrayData, planes: Int, seed: Int,
                    floatElems: Boolean, probes: Int): ArrayData = {
    val dim = vec.numElements()
    val hp = hyperplanes(planes, seed, dim)
    val accs = new Array[Double](planes)
    var sig = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        val x = if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * hp(base + i)
        i += 1
      }
      accs(p) = acc
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    val order = Array.range(0, planes)
      .sortBy(q => (math.abs(accs(q)), q))
    val out = new Array[Long](probes)
    out(0) = sig
    var j = 1
    while (j < probes) {
      out(j) = sig ^ (1L << order(j - 1))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def srpBucket(vec: Column, planes: Int, seed: Int = 0): Column =
    GraftSqlBridge.column(
      SrpBucket(GraftSqlBridge.expression(vec), planes, seed))

  def srpProbes(vec: Column, planes: Int, probes: Int, seed: Int = 0): Column =
    GraftSqlBridge.column(
      SrpProbes(GraftSqlBridge.expression(vec), planes, seed, probes))
}
