package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("count-min sketch: estimates dominate true counts; exact at this width") {
    val rows = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
      (1 to 30).map(i => s"k$i")).toDF("k")
    val sketch = Sketches.cmsBuild(rows, "k", depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(sketch, rows.select(col("k")), "k",
      depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS guarantee: the estimate NEVER undercounts
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    // 32 distinct keys in a 4x1024 grid: the md5 cells happen to be
    // collision-free, so the min recovers every exact count (fixed
    // hashes => deterministic, not flaky)
    assert(est == exact)
    // sketch size is depth x width bounded, not keyed by cardinality
    assert(sketch.count() <= 4L * 1024L)
  }

  test("cmsMerge: merged half-sketches equal the single-pass build cell-for-cell") {
    val rows = (Seq.fill(30)("a") ++ Seq.fill(12)("b") ++
      (1 to 25).map(i => s"k$i")).zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "i")
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketches.cmsBuild(rows, "k")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(rows.filter(col("i") % 2 === 0), "k"),
      Sketches.cmsBuild(rows.filter(col("i") % 2 === 1), "k"))
    assert(cells(merged) == cells(full))
    // overlapping merge just adds counters: build ∪ build = doubled grid
    val doubled = Sketches.cmsMerge(full, full)
    assert(cells(doubled) == cells(full).view.mapValues(_ * 2).toMap)
  }
}
