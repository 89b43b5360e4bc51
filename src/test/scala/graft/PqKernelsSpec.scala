package graft

import graft.plans.{AdcLookupSum, NearestCentroid, PqAssignCodes}
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity pins for the r18 native ANN kernels (PqKernels scaladoc): each
  * kernel must reproduce its replaced composable higher-order-function
  * chain ELEMENT FOR ELEMENT — including the edge algebra the lambda
  * forms implied (NULL vector → cid 0 / zero codes; zero-norm → NaN
  * cosine ranked largest-first-wins; short vector → per-subspace null-d2
  * skip; ADC null hole → null sum). The chains below are verbatim copies
  * of the pre-r18 implementations. */
class PqKernelsSpec extends SparkSpec {

  import spark.implicits._

  // ---- the pre-r18 composable forms, verbatim ----

  private def sqDistOld(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, d) => acc + d)

  private def nearestCidOld(vec: Column, entries: Column): Column =
    aggregate(
      transform(entries, e => struct(
        cosineSim(vec, e.getField("_2")).as("sim"),
        e.getField("_1").as("cid"))),
      struct(lit(Double.NegativeInfinity).as("sim"), lit(0).as("cid")),
      (acc, p) => when(p.getField("sim") > acc.getField("sim"), p)
        .otherwise(acc))
      .getField("cid")

  private def argminCidOld(sub: Column, entries: Column): Column =
    aggregate(entries,
      struct(lit(Double.MaxValue).as("d2"), lit(0).as("cid")),
      (acc, e) =>
        when(sqDistOld(sub, e.getField("_2")) < acc.getField("d2"),
          struct(sqDistOld(sub, e.getField("_2")).as("d2"),
            e.getField("_1").as("cid")))
          .otherwise(acc))
      .getField("cid")

  private def assignCodesOld(vec: Column, cbLit: Column, m: Int,
                             dim: Int): Column = {
    val d = dim / m
    transform(sequence(lit(0), lit(m - 1)),
      j => argminCidOld(slice(vec, j * d + 1, lit(d)),
        element_at(cbLit, j + 1)))
  }

  private def lookupSumOld(codes: Column, tab: Column): Column =
    aggregate(zip_with(codes, tab, (c, arr) => element_at(arr, c)),
      lit(0.0d), (acc, x) => acc + x)

  // ---- fixtures: deterministic vectors incl. every edge case ----

  private val dim = 16
  private val m = 4

  // entries: 5 centroids, cid-ascending, incl. a zero vector (NaN cosine)
  // and two equidistant twins (tie → lowest cid must win)
  private def vecOf(f: Int => Float): Seq[Float] = (0 until dim).map(f)
  private val cents: Seq[(Int, Seq[Float])] = Seq(
    1 -> vecOf(i => (i % 5 - 2).toFloat),
    2 -> vecOf(i => (i % 3).toFloat * 0.5f),
    3 -> vecOf(_ => 0.0f),
    4 -> vecOf(i => math.sin(i.toDouble).toFloat),
    5 -> vecOf(i => math.sin(i.toDouble).toFloat)) // twin of 4

  private val byJ: Seq[Seq[(Int, Seq[Float])]] = (0 until m).map { j =>
    Seq(1 -> vecOf(i => i.toFloat).slice(j * 4, j * 4 + 4),
      2 -> vecOf(i => (i * i % 7).toFloat).slice(j * 4, j * 4 + 4),
      3 -> vecOf(i => (i * i % 7).toFloat).slice(j * 4, j * 4 + 4), // twin
      4 -> Seq(0f, 0f, 0f, 0f))
  }

  private val vectors: Seq[(Long, Option[Seq[Float]])] = Seq(
    1L -> Some(vecOf(i => i.toFloat / 3)),
    2L -> Some(vecOf(_ => 0.0f)),                  // zero norm → NaN cosine
    3L -> Some(vecOf(i => if (i == 2) Float.NaN else 1.0f)), // NaN element
    4L -> Some(Seq(1f, 2f, 3f)),                   // shorter than dim
    5L -> None,                                    // NULL vector
    6L -> Some(vecOf(i => -i.toFloat)),
    7L -> Some(vecOf(i => math.cos(i.toDouble).toFloat)))

  private lazy val df = vectors.toDF("vid", "vec")

  test("NearestCentroid == composable aggregate(transform) chain") {
    // parity over BOTH centroid sets: with the zero-norm centroid (its
    // NaN cosine wins everywhere — the NaN-largest edge) and without it
    // (real discrimination between candidates)
    Seq(cents, cents.filterNot(_._1 == 3)).foreach { cs =>
      val rows = df.select(col("vid"),
          NearestCentroid.nearestCid(col("vec"), cs).as("native"),
          nearestCidOld(col("vec"), typedLit(cs)).as("composable"))
        .collect()
      rows.foreach { r =>
        val native = r.getInt(1)
        // the composable chain yields 0 (not null) for a NULL vec — acc
        // survives the fold; getAs covers both representations
        val old = if (r.isNullAt(2)) 0 else r.getInt(2)
        assert(native == old, s"vid ${r.getLong(0)}: $native != $old")
      }
    }
    // sanity on the intent, not just parity: the tie pair (4, 5) must
    // resolve to 4 for a vector nearest that direction. The zero-norm
    // centroid (cid 3) is excluded here — its cosine is NaN against
    // every query and Spark ranks NaN largest, so with it present cid 3
    // wins for EVERY non-degenerate vector (in both forms alike; the
    // parity loop above covers that case).
    val noZero = cents.filterNot(_._1 == 3)
    // query with the twins' own direction: cosine is exactly 1.0 with
    // both cid 4 and cid 5, so only the first-winner rule decides
    val twinQ = Seq(Tuple1(vecOf(i => math.sin(i.toDouble).toFloat)))
      .toDF("vec")
    val tie = twinQ.select(
      NearestCentroid.nearestCid(col("vec"), noZero)).head.getInt(0)
    assert(tie == 4)
  }

  test("PqAssignCodes == composable m-way transform(aggregate) chain") {
    val rows = df.select(col("vid"),
        PqAssignCodes.assignCodes(col("vec"), byJ, dim / m).as("native"),
        assignCodesOld(col("vec"), typedLit(byJ), m, dim).as("composable"))
      .collect()
    rows.foreach { r =>
      val native = r.getSeq[Int](1)
      val old =
        if (r.isNullAt(2)) Seq.fill(m)(0) // transform(null vec) edge
        else r.getSeq[Int](2)
      assert(native == old, s"vid ${r.getLong(0)}: $native != $old")
    }
    // the tie subspaces (cids 2, 3 twins) must pick 2
    val v1 = df.filter(col("vid") === 1L)
      .select(PqAssignCodes.assignCodes(col("vec"), byJ, dim / m))
      .head.getSeq[Int](0)
    assert(!v1.contains(3), s"tie must keep the lowest cid: $v1")
    // short vector: every full subspace beyond its length yields cid 0
    val v4 = df.filter(col("vid") === 4L)
      .select(PqAssignCodes.assignCodes(col("vec"), byJ, dim / m))
      .head.getSeq[Int](0)
    assert(v4 == Seq(0, 0, 0, 0), s"short vec skips all candidates: $v4")
  }

  test("AdcLookupSum == composable zip_with fold, incl. null holes") {
    val tabs: Seq[(Long, Seq[Int], Seq[Option[Seq[Double]]])] = Seq(
      (1L, Seq(1, 2, 1, 3),
        Seq(Some(Seq(0.5, 1.5, 2.5)), Some(Seq(1.0, 2.0, 3.0)),
          Some(Seq(-1.0, 0.0, 1.0)), Some(Seq(4.0, 5.0, 6.0)))),
      // a dropped-centroid hole: tab(1) is null → whole sum null
      (2L, Seq(1, 2, 1, 3),
        Seq(Some(Seq(0.5, 1.5, 2.5)), None,
          Some(Seq(-1.0, 0.0, 1.0)), Some(Seq(4.0, 5.0, 6.0)))))
    val t = tabs.toDF("id", "codes", "tab")
    val rows = t.select(col("id"),
        AdcLookupSum.lookupSum(col("codes"), col("tab")).as("native"),
        lookupSumOld(col("codes"), col("tab")).as("composable"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"id ${r.getLong(0)}: null mismatch")
      if (!r.isNullAt(1))
        assert(r.getDouble(1) == r.getDouble(2),
          s"id ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    assert(rows.count(_.isNullAt(1)) == 1)
    // an out-of-range code (4 > len 3) is UNREACHABLE in production
    // (codes are produced by assignCodes over the same codebook the tabs
    // are built from) — and under Spark 4's default ANSI mode the
    // composable element_at THROWS on it, so it cannot be in the parity
    // set; the native kernel keeps the pre-ANSI null algebra instead.
    val oor = Seq((3L, Seq(4, 2, 1, 3),
      Seq(Some(Seq(0.5, 1.5, 2.5)), Some(Seq(1.0, 2.0, 3.0)),
        Some(Seq(-1.0, 0.0, 1.0)), Some(Seq(4.0, 5.0, 6.0)))))
      .toDF("id", "codes", "tab")
      .select(AdcLookupSum.lookupSum(col("codes"), col("tab"))).head
    assert(oor.isNullAt(0), "out-of-range code must yield null, not throw")
  }

  test("kernels hold under codegen and interpreted paths alike") {
    // pin the interpreted path by calling eval() directly on a resolved
    // Literal child (GraftSqlBridge.expression(typedLit(...)) yields an
    // unresolved-alias wrapper that is Unevaluable — Literal.create is
    // the resolved form), and compare against the DataFrame path (which
    // runs the codegen'd kernel)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val expr = graft.plans.NearestCentroid(
      Literal.create(vecOf(i => i.toFloat / 3),
        ArrayType(FloatType, containsNull = false)), cents)
    val interpreted = expr.eval(null)
    val viaDf = df.filter(col("vid") === 1L)
      .select(NearestCentroid.nearestCid(col("vec"), cents)).head.getInt(0)
    assert(interpreted == viaDf)
  }
}
