package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — Z-ORDER (Morton-curve)
  * interleaving, the storage-side half of scan efficiency at 100 TB.
  *
  * Predicate pushdown prunes parquet row groups through per-column
  * min/max stats, but stats are only tight for columns the file layout
  * is sorted by: a table sorted by `a` prunes `WHERE a = …` perfectly
  * and `WHERE b = …` not at all (every row group spans b's full range).
  * Interleaving the bits of both dimensions into one sort key gives
  * every row group a small RECTANGLE of (a, b) space, so a selective
  * predicate on EITHER column — or a 2-D box on both — skips most row
  * groups from the footer alone (the Delta Lake / Databricks OPTIMIZE
  * ZORDER and Iceberg sort-order design; Morton 1966). `ZCurveSpec`
  * measures the pruning on real footers: the same box query against the
  * same rows intersects a small fraction of the z-ordered row groups vs
  * nearly all of the single-column-sorted ones.
  *
  * Everything here is exact BIGINT bit arithmetic on Spark builtins
  * (shift/and/or — whole-stage-codegen'd, no UDF, no custom expression),
  * and DuckDB mirrors the identical chain, so the z-values themselves
  * sit under the driver oracle (`q_zorder_cluster`).
  *
  * Reference behavior being re-expressed: querysight.py:611-668 orders
  * exports by single analyst-chosen keys; a Spark-native engine writing
  * 100 TB of curated corpus back to parquet needs the multi-dimensional
  * generalization or every secondary-dimension scan is a full read. */
object Layout {

  /** Bits kept per dimension. Two dims × 21 = 42-bit z-values — sign-safe
    * in a BIGINT with headroom, and 2^21 cells per axis is far below any
    * practical row-group count, so resolution never limits pruning. */
  val BitsPerDim = 21

  /** Spread the low 21 bits of `x` so source bit i lands at position 2i
    * (the classic magic-number shift-mask chain, one step per power of
    * two). Input must already be masked to [[BitsPerDim]] bits —
    * [[normalizeShift]] guarantees it. */
  def spreadBits2(x: Column): Column = {
    val s16 = shiftleft(x, 16).bitwiseOR(x).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s8 = shiftleft(s16, 8).bitwiseOR(s16).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s4 = shiftleft(s8, 4).bitwiseOR(s8).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s2 = shiftleft(s4, 2).bitwiseOR(s4).bitwiseAND(lit(0x3333333333333333L))
    shiftleft(s2, 1).bitwiseOR(s2).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Map a value of known range [lo, hi] onto its top [[BitsPerDim]]
    * bits: subtract the floor, right-shift by `shiftFor(lo, hi)`. Shift,
    * not division — exact at any magnitude (a 2^63 range divides
    * inexactly through doubles past 2^53; a shift never does) and
    * mirrored by DuckDB's `>>` bit-for-bit. */
  def normalizeShift(x: Column, lo: Long, shift: Int): Column =
    shiftright(x - lit(lo), shift).bitwiseAND(lit((1L << BitsPerDim) - 1))

  /** The right-shift that brings range [lo, hi] under 2^21. Bounds must
    * span LESS than 2^63 (r15 ADVICE): `hi - lo` on a wider domain
    * overflows Long silently here (yielding shift 0 and mask-wrapped
    * z-values) while the DuckDB mirror raises on BIGINT overflow —
    * a cross-engine divergence. Refuse it by name instead. */
  def shiftFor(lo: Long, hi: Long): Int = {
    if (hi > lo)
      try Math.subtractExact(hi, lo)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"zorder bounds [$lo, $hi] span >= 2^63; Long bit arithmetic " +
            "(and the DuckDB BIGINT mirror) cannot represent the range — " +
            "pre-scale the column or pass tighter known-domain bounds")
      }
    val range = math.max(hi - lo, 0L)
    math.max(0, 64 - BitsPerDim - java.lang.Long.numberOfLeadingZeros(range))
  }

  /** 2-D Morton interleave of two already-normalized (< 2^21) columns:
    * a's bits land at even positions, b's at odd. Monotone in each
    * dimension when the other is fixed; adjacent z-values are adjacent
    * cells of the (a, b) grid. */
  def zValue2(a: Column, b: Column): Column =
    spreadBits2(a).bitwiseOR(shiftleft(spreadBits2(b), 1))

  /** Spread the low 21 bits of `x` so source bit i lands at position 3i
    * (the 3-D magic-number chain; 3 × 21 = 63 bits keeps the sign bit
    * clear, so BIGINT ordering stays the curve ordering). */
  def spreadBits3(x: Column): Column = {
    val s32 = shiftleft(x, 32).bitwiseOR(x).bitwiseAND(lit(0x001F00000000FFFFL))
    val s16 = shiftleft(s32, 16).bitwiseOR(s32).bitwiseAND(lit(0x001F0000FF0000FFL))
    val s8 = shiftleft(s16, 8).bitwiseOR(s16).bitwiseAND(lit(0x100F00F00F00F00FL))
    val s4 = shiftleft(s8, 4).bitwiseOR(s8).bitwiseAND(lit(0x10C30C30C30C30C3L))
    shiftleft(s4, 2).bitwiseOR(s4).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 3-D Morton interleave of three already-normalized (< 2^21)
    * columns — the generalization a (time, tenant, key) or (lang,
    * source, length-band) layout clusters on. Bits land at positions
    * 3i / 3i+1 / 3i+2 for a / b / c respectively. */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spreadBits3(a).bitwiseOR(shiftleft(spreadBits3(b), 1))
      .bitwiseOR(shiftleft(spreadBits3(c), 2))

  /** The z-value column for `df`'s (aCol, bCol) under their OBSERVED
    * min/max (one cheap driver-bounded aggregate — the codebook-literal
    * discipline; at production scale pass known domain bounds instead
    * via the 6-arg overload to skip the pass). */
  def zValueFor(df: DataFrame, aCol: String, bCol: String): Column = {
    val r = df.agg(min(col(aCol)).cast("long"), max(col(aCol)).cast("long"),
      min(col(bCol)).cast("long"), max(col(bCol)).cast("long"))
      .collect().head
    zValueFor(aCol, bCol, r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
  }

  /** The z-value column under KNOWN domain bounds — no data pass. */
  def zValueFor(aCol: String, bCol: String, aLo: Long, aHi: Long,
                bLo: Long, bHi: Long): Column =
    zValue2(
      normalizeShift(col(aCol).cast("long"), aLo, shiftFor(aLo, aHi)),
      normalizeShift(col(bCol).cast("long"), bLo, shiftFor(bLo, bHi)))

  /** Write `df` to `path` CLUSTERED on the z-order of (aCol, bCol):
    * range-partition on the z-value (each output file owns a contiguous
    * z range = a small rectangle of (a, b) space), sort within
    * partitions (tight row-group stats inside each file), drop the
    * helper column. `files` sizes the output — at 100 TB pick it so
    * files land near the row-group/HDFS sweet spot (~128 MB–1 GB);
    * range partitioning keeps the write one shuffle regardless. */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
                  files: Int): Unit = {
    val zc = zValueFor(df, aCol, bCol)
    df.withColumn("__z", zc)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The DuckDB mirror of [[spreadBits2]] over SQL expression `e` —
    * the identical shift-mask chain (`<<`/`&`/`|` are exact BIGINT ops
    * in both engines), so z-values sit under the driver oracle. */
  def duckdbSpreadSql(e: String): String = {
    val steps = Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(s"($e)") { case (acc, (sh, mask)) =>
      s"((($acc << $sh) | $acc) & $mask)"
    }
  }

  /** DuckDB mirror of the full normalize-and-interleave: `aE`/`bE` are
    * raw value expressions, `aLoE`… bound expressions (typically CTE
    * columns), shifts as SQL (`greatest(0, length(printf('%b', range))
    * - 21)` == the Scala `64 - numberOfLeadingZeros` formula for any
    * range ≥ 0). */
  def duckdbZValueSql(aE: String, bE: String, aLoE: String, aHiE: String,
                      bLoE: String, bHiE: String): String = {
    val m = (1L << BitsPerDim) - 1
    def shiftSql(lo: String, hi: String) =
      s"greatest(0, length(printf('%b', greatest(($hi) - ($lo), 0))) - $BitsPerDim)"
    val aN = s"(((($aE) - ($aLoE)) >> ${shiftSql(aLoE, aHiE)}) & $m)"
    val bN = s"(((($bE) - ($bLoE)) >> ${shiftSql(bLoE, bHiE)}) & $m)"
    s"(${duckdbSpreadSql(aN)} | (${duckdbSpreadSql(bN)} << 1))"
  }
}
