package graft

import graft.sources.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Layout]] — z-order clustering. Three load-bearing claims: the
  * builtin shift-mask chain really computes the Morton interleave
  * (pinned against a bit-by-bit reference); clustering is a pure layout
  * change (round-trip preserves rows exactly); and the layout EARNS its
  * keep — measured on real parquet footers, a secondary-dimension
  * predicate intersects a small fraction of the z-ordered files' min/max
  * ranges while pruning nothing at all on a single-column-sorted layout
  * of the same rows. */
class ZCurveSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference Morton interleave (the definition, not the
    * magic-number chain under test). */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until Layout.BitsPerDim).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 == bit-by-bit Morton reference on adversarial and random pairs") {
    val edge = Seq(0L, 1L, 2L, 3L, (1L << 20) - 1, 1L << 20, (1L << 21) - 1)
    val rnd = (1L to 500L).map(i => (i * 2654435761L) & ((1L << 21) - 1))
    val pairs = (for (a <- edge; b <- edge) yield (a, b)) ++
      rnd.zip(rnd.reverse)
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.zValue2(col("a"), col("b")))
    val bad = df.collect().filter(r =>
      r.getLong(2) != mortonRef(r.getLong(0), r.getLong(1)))
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  private def morton3Ref(a: Long, b: Long, c: Long): Long =
    (0 until Layout.BitsPerDim).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (3 * i)) | (((b >> i) & 1L) << (3 * i + 1)) |
        (((c >> i) & 1L) << (3 * i + 2))
    }

  test("zValue3 == bit-by-bit 3-D Morton reference; sign bit stays clear") {
    val edge = Seq(0L, 1L, (1L << 20) - 1, (1L << 21) - 1)
    val rnd = (1L to 300L).map(i => (i * 2654435761L) & ((1L << 21) - 1))
    val triples = (for (a <- edge; b <- edge; c <- edge) yield (a, b, c)) ++
      rnd.indices.map(i => (rnd(i), rnd((i + 7) % rnd.size),
        rnd((i + 13) % rnd.size)))
    val df = triples.toDF("a", "b", "c")
      .withColumn("z", Layout.zValue3(col("a"), col("b"), col("c")))
    val rows = df.collect()
    val bad = rows.filter(r =>
      r.getLong(3) != morton3Ref(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
    // 3 × 21 = 63 bits: the sign bit never sets, BIGINT order == curve order
    assert(rows.forall(_.getLong(3) >= 0L))
  }

  test("shiftFor + normalizeShift map any range onto < 2^21 monotonically") {
    val cases = Seq((0L, 0L), (0L, 100L), (-50L, 50L), (0L, (1L << 21) - 1),
      (0L, 1L << 21), (5L, 5L + (1L << 40)), (Long.MinValue / 4, Long.MaxValue / 4))
    cases.foreach { case (lo, hi) =>
      val s = Layout.shiftFor(lo, hi)
      val top = (hi - lo) >> s
      assert(top >= 0 && top < (1L << Layout.BitsPerDim), s"($lo,$hi) -> $top")
      // widest shift still separates the endpoints of a non-trivial range
      if (hi - lo >= (1L << Layout.BitsPerDim)) assert(top > 0)
    }
  }

  test("z-ordered layout prunes the secondary dimension; single-sort cannot") {
    // two independent uniform dims — the worst case for one sort key
    val n = 100000
    val rows = (0 until n).map { i =>
      val a = (i * 2654435761L) % 1000000L
      val b = (i * 40503L + 7L) % 1000000L
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zcurve").toString
    val files = 64
    Layout.zorderWrite(df, "a", "b", s"$dir/zorder", files)
    df.repartitionByRange(files, col("a"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.mode("overwrite").parquet(s"$dir/asort")

    // footer min/max per file for a column — the stats a scan prunes by
    def ranges(path: String, column: String): Seq[(Long, Long)] = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(conf)
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .flatMap { st =>
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(st.getPath, conf))
          try r.getFooter.getBlocks.asScala.toSeq.map { blk =>
            val c = blk.getColumns.asScala
              .find(_.getPath.toDotString == column).get
            val stats = c.getStatistics
            (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue,
              stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          } finally r.close()
        }
    }
    def intersecting(rs: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }

    // a 10% slice of ONLY the secondary dimension b
    val (bLo, bHi) = (400000L, 500000L)
    val zB = ranges(s"$dir/zorder", "b")
    val aB = ranges(s"$dir/asort", "b")
    val zHit = intersecting(zB, bLo, bHi)
    val aHit = intersecting(aB, bLo, bHi)
    // sorted-by-a: every file spans ~all of b — nothing prunes
    assert(aHit >= (aB.size * 9) / 10, s"asort hit $aHit of ${aB.size}")
    // z-order: most files' b-rectangles miss the slice
    assert(zHit * 2 <= zB.size, s"zorder hit $zHit of ${zB.size}")
    // and the layouts agree on the query's ROWS — clustering is layout only
    val zRows = spark.read.parquet(s"$dir/zorder")
      .filter(col("b") >= bLo && col("b") <= bHi)
    val aRows = spark.read.parquet(s"$dir/asort")
      .filter(col("b") >= bLo && col("b") <= bHi)
    assert(zRows.count() == aRows.count() &&
      zRows.except(aRows).isEmpty && aRows.except(zRows).isEmpty)
    // primary dimension still prunes on the z layout too (both-dims win)
    val zA = ranges(s"$dir/zorder", "a")
    assert(intersecting(zA, 400000L, 500000L) * 2 <= zA.size)
  }

  test("zorderWrite round-trips rows exactly") {
    val df = (1L to 5000L).map(i => (i % 997, (i * 31) % 811, s"p$i"))
      .toDF("a", "b", "payload")
    val dir = java.nio.file.Files.createTempDirectory("zround").toString
    Layout.zorderWrite(df, "a", "b", s"$dir/t", 8)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 5000L)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }
}
