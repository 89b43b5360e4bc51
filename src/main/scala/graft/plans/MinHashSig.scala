package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an `array<long>` of shingle hashes, ONE pass:
  * element `i` of the result is `min over h of xxhash64(i, h)` — bit-equal
  * to Spark's builtin `min(xxhash64(lit(i), col))` aggregate (seed 42,
  * int-literal then long chaining), proven in `DedupSpec`.
  *
  * This computes the whole k-family signature where the document's shingle
  * hashes already live, replacing the shuffled form (explode every shingle
  * occurrence → corpus-wide `.distinct()` → `groupBy(doc)` with k min
  * aggregates) that made the signature build the heaviest part of the
  * round-3 sf1 MinHash bench (107 s, two full shuffles of the 5-gram
  * stream). Duplicate shingles don't change a minimum, so the in-row form
  * needs no distinct at all.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Per-family seeds: xxhash64's multi-arg chaining starts at seed 42 and
    * folds the int literal first — constant across rows, so hoisted here. */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def seeds(k: Int): Array[Long] = {
    var s = seedCache.get(k)
    if (s == null) {
      s = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))
      seedCache.putIfAbsent(k, s)
    }
    s
  }

  /** One pass over the hashes, k running minima. Callers feed shingle
    * arrays that are never empty ([[graft.functions.Text.shinglesFromTokens]]
    * degenerates to one whole-text shingle), matching the shuffled form's
    * row universe; a defensively-empty input yields Long.MaxValue minima. */
  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val s = seeds(k)
    val out = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, s(j))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(c: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), numHashes))
}
