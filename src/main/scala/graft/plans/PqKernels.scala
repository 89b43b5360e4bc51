package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen kernels for the ANN assignment/serving hot loops —
  * optimization-guide step 4 ("eliminate non-codegen Expressions in the
  * hot path") applied to the three per-row loops the r18 profile showed
  * dominating every ANN query's task time:
  *
  *  - [[NearestCentroid]]: the IVF cell assignment
  *    ([[graft.operators.Ivf]] `nearestCid`) — was
  *    `aggregate(transform(entries, …cosine…))`;
  *  - [[PqAssignCodes]]: PQ quantization ([[graft.operators.Pq]]
  *    `assignCodes`) — was an m-way `transform` of
  *    `aggregate(entries, …sqDist twice per candidate…)`;
  *  - [[AdcLookupSum]]: the per-candidate ADC table fold
  *    ([[graft.operators.Pq]] `adcCosine`) — was
  *    `aggregate(zip_with(codes, tab, element_at))`.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambdas INTERPRETED, element by element, with a bound
  * lambda variable and an intermediate array per step — and their
  * presence blocks whole-stage codegen for the enclosing operator. The
  * r18 profile measured a 2-iteration Lloyd pass over the sf0.1
  * embeddings burning ~16 s of task CPU per pass against a ~0.1 s
  * napkin floor (70k rows × 16 centroids × 64 dims ≈ 72M fused
  * multiply-adds). These kernels run the SAME folds as tight JVM loops
  * (static `compute` methods, the [[SrpBucket]] pattern) and keep the
  * enclosing stage inside whole-stage codegen.
  *
  * BIT-IDENTICAL by construction — each kernel replays its composable
  * form's exact IEEE operation order and null/NaN algebra (spec'd
  * element-for-element in PqKernelsSpec against the original
  * expression trees, and the untouched DuckDB oracles of every q_ann_*
  * query pin the whole composition cross-engine):
  *
  *  - cosine = the [[CosineSimilarity]] fold (common prefix, xy/xx/yy
  *    accumulated left-to-right in double, then xy/sqrt(xx·yy); 0-norm
  *    → NaN);
  *  - double comparisons follow Spark's SQL ordering (NaN largest,
  *    ±0.0 equal — GreaterThan/LessThan over DoubleType);
  *  - argmax keeps the FIRST (lowest-cid) winner under strict `>`, acc
  *    seeded (−∞, 0): a NULL vector scores no candidate and yields cid
  *    0, exactly as the lambda chain did (cosine(null) → null sim →
  *    predicate null → acc kept);
  *  - PQ argmin keeps the lowest cid under strict `<`, acc seeded
  *    (Double.MaxValue, 0); a subvector slice shorter than d made every
  *    candidate's zip_with pad nulls → null d2 → candidate skipped, so
  *    a too-short (or NULL) vector emits code 0 for that subspace —
  *    replicated verbatim;
  *  - the ADC fold returns NULL if any looked-up cell is null (a
  *    dropped-centroid hole), as `acc + null` did. */
object PqKernels {

  /** Spark SQL's double ordering (SQLOrderingUtil.compareDoubles
    * semantics): ±0.0 compare equal, NaN is the largest value. */
  @inline private[plans] def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** The [[CosineSimilarity]] fold against a float[] codeword. */
  @inline private def cosine(vec: ArrayData, cvec: Array[Float]): Double = {
    val n = math.min(vec.numElements(), cvec.length)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = vec.getFloat(i).toDouble
      val yi = cvec(i).toDouble
      xy += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    xy / math.sqrt(xx * yy)
  }

  /** Argmax of cosine over cid-ascending entries; first winner under
    * strict `>` from a (−∞, cid 0) seed. */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Float]],
                      cids: Array[Int]): Int = {
    var best = Double.NegativeInfinity
    var bestCid = 0
    var e = 0
    while (e < cents.length) {
      val sim = cosine(vec, cents(e))
      if (cmp(sim, best) > 0) { best = sim; bestCid = cids(e) }
      e += 1
    }
    bestCid
  }

  /** One subspace's argmin of the exact sequential sqDist fold; lowest
    * cid under strict `<` from a (MaxValue, cid 0) seed. `off` is the
    * subspace's base index into `vec`; a slice shorter than d skips
    * every candidate (null-d2 semantics) and yields cid 0. */
  private def argminCid(vec: ArrayData, off: Int, d: Int,
                        cents: Array[Array[Float]], cids: Array[Int]): Int = {
    if (vec.numElements() < off + d) return 0
    var best = Double.MaxValue
    var bestCid = 0
    var e = 0
    while (e < cents.length) {
      val cvec = cents(e)
      var d2 = 0.0
      var i = 0
      while (i < d) {
        val diff = vec.getFloat(off + i).toDouble - cvec(i).toDouble
        d2 += diff * diff
        i += 1
      }
      if (cmp(d2, best) < 0) { best = d2; bestCid = cids(e) }
      e += 1
    }
    bestCid
  }

  /** All m subspace codes in one pass. `cents(j)`/`cids(j)` are
    * subspace j's cid-ascending entries. */
  def assign(vec: ArrayData, cents: Array[Array[Array[Float]]],
             cids: Array[Array[Int]], d: Int): ArrayData = {
    val m = cents.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      out(j) = if (vec == null) 0 else argminCid(vec, j * d, d, cents(j), cids(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_j tab(j)(codes(j) − 1) in j order; NULL (boxed) if any cell or
    * code is null — the `acc + null` algebra of the zip_with fold.
    * Boxed return so codegen's null check is one reference test. */
  def adcLookupSum(codes: ArrayData, tab: ArrayData): java.lang.Double = {
    val n = math.max(codes.numElements(), tab.numElements())
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (j >= codes.numElements() || j >= tab.numElements()) return null
      if (codes.isNullAt(j) || tab.isNullAt(j)) return null
      val arr = tab.getArray(j)
      val c = codes.getInt(j)
      // element_at semantics: 1-based; out-of-range or null cell → null
      if (c < 1 || c > arr.numElements() || arr.isNullAt(c - 1)) return null
      acc += arr.getDouble(c - 1)
      j += 1
    }
    acc
  }
}

/** In-row IVF cell assignment against driver-side centroid entries
  * (cid-ascending). See [[PqKernels]] for the parity contract. */
case class NearestCentroid(child: Expression, entries: Seq[(Int, Seq[Float])])
    extends UnaryExpression {
  require(entries.nonEmpty, "NearestCentroid needs at least one centroid")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = false

  @transient private lazy val centsArr: Array[Array[Float]] =
    entries.map(_._2.toArray).toArray
  @transient private lazy val cidsArr: Array[Int] = entries.map(_._1).toArray

  // a NULL vector yields cid 0 (the composable chain's algebra), so
  // evaluation must NOT be null-short-circuited
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else PqKernels.nearestCentroid(v.asInstanceOf[ArrayData], centsArr, cidsArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("cents", centsArr, "float[][]")
    val cids = ctx.addReferenceObj("cids", cidsArr, "int[]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |int ${ev.value} = ${c.isNull} ? 0 :
            |  graft.plans.PqKernels.nearestCentroid(${c.value}, $cents, $cids);
            |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def nearestCid(vec: Column, entries: Seq[(Int, Seq[Float])]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(vec), entries))
}

/** In-row PQ quantization against the driver-side codebook (subspace →
  * cid-ascending entries). See [[PqKernels]] for the parity contract. */
case class PqAssignCodes(child: Expression,
                         byJ: Seq[Seq[(Int, Seq[Float])]], d: Int)
    extends UnaryExpression {
  require(byJ.nonEmpty, "PqAssignCodes needs at least one subspace")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign_codes"
  override def nullable: Boolean = false

  @transient private lazy val centsArr: Array[Array[Array[Float]]] =
    byJ.map(_.map(_._2.toArray).toArray).toArray
  @transient private lazy val cidsArr: Array[Array[Int]] =
    byJ.map(_.map(_._1).toArray).toArray

  // a NULL vector yields [0]*m, not NULL (transform runs over the
  // literal subspace sequence; every argmin skips all candidates)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    PqKernels.assign(
      if (v == null) null else v.asInstanceOf[ArrayData], centsArr, cidsArr, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("cents", centsArr, "float[][][]")
    val cids = ctx.addReferenceObj("cids", cidsArr, "int[][]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            |  graft.plans.PqKernels.assign(
            |    ${c.isNull} ? null : ${c.value}, $cents, $cids, $d);
            |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

object PqAssignCodes {
  def assignCodes(vec: Column, byJ: Seq[Seq[(Int, Seq[Float])]],
                  d: Int): Column =
    GraftSqlBridge.column(
      PqAssignCodes(GraftSqlBridge.expression(vec), byJ, d))
}

/** Per-candidate ADC table fold: Σ_j tab(j)(codes(j)), 1-based, null on
  * any hole. See [[PqKernels]] for the parity contract. */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup_sum"
  // Can return null on a dropped-centroid hole even when both inputs are
  // non-null — and nullSafeCodeGen's non-nullable branch would otherwise
  // bind ev.isNull to the `false` literal, making the `${ev.isNull} =
  // true` assignment below invalid Java (the r18 interpreter-fallback
  // regression caught by PqKernelsSpec).
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, tab: Any): Any =
    PqKernels.adcLookupSum(codes.asInstanceOf[ArrayData],
      tab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Double $boxed = graft.plans.PqKernels.adcLookupSum($c, $t);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AdcLookupSum {
  def lookupSum(codes: Column, tab: Column): Column =
    GraftSqlBridge.column(AdcLookupSum(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(tab)))
}
