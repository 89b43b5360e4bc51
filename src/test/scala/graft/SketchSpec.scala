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
}
