package graft

import graft.operators.Vectors
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def seqOf[T](r: Row, name: String): Seq[T] =
    r.getSeq[T](r.fieldIndex(name)).toSeq

  test("normalize: 3-4-5 triangle") {
    val df = Seq((1L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val r = Vectors.normalize(df, "vec_id", "embedding").head()
    assert(r.getAs[Double]("l2_norm") == 5.0)
    assert(seqOf[Double](r, "unit_vec") == Seq(0.6, 0.8))
  }

  test("centroids: exact element-wise mean per group") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Vectors.centroids(df, "label", "embedding")
      .orderBy("label").collect()
    assert(out(0).getAs[Long]("n_vectors") == 2L)
    // all inputs exact in fixed point → exact means
    assert(seqOf[Double](out(0), "centroid") == Seq(2.0, 4.0))
    assert(seqOf[Double](out(1), "centroid") == Seq(10.0, 0.0))
  }

  test("centroids are byte-identical under repartitioning") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      (s"g${i % 3}", Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("label", "embedding")
    def run(parts: Int) =
      Vectors.centroids(df.repartition(parts), "label", "embedding")
        .orderBy("label").collect()
        .map(r => (r.getString(0), seqOf[Double](r, "centroid")))
        .toSeq
    // exact bigint accumulation is associative: any partitioning, same bits
    assert(run(1) == run(8))
  }

  test("quantizeInt8: endpoints, midpoint, and error bound") {
    val df = Seq((1L, Seq(0.0f, 0.5f, 1.0f))).toDF("vec_id", "embedding")
    val r = Vectors.quantizeInt8(df, "vec_id", "embedding").head()
    assert(r.getAs[Double]("vmin") == 0.0 && r.getAs[Double]("vmax") == 1.0)
    assert(seqOf[Long](r, "q") == Seq(0L, 128L, 255L))
    val step = 1.0 / 255.0
    assert(math.abs(r.getAs[Double]("max_abs_err") - (128 * step - 0.5)) < 1e-15)
    // reconstruction error never exceeds half a step
    assert(r.getAs[Double]("max_abs_err") <= step / 2 + 1e-15)
  }

  test("quantizeInt8: constant vector quantizes to zeros with zero error") {
    val df = Seq((1L, Seq(0.25f, 0.25f, 0.25f))).toDF("vec_id", "embedding")
    val r = Vectors.quantizeInt8(df, "vec_id", "embedding").head()
    assert(r.getAs[Double]("step") == 0.0)
    assert(seqOf[Long](r, "q") == Seq(0L, 0L, 0L))
    assert(r.getAs[Double]("max_abs_err") == 0.0)
  }
}
