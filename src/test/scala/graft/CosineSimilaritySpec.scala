package graft

import graft.functions.Vectors
import graft.plans.CosineSimilarity
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals the composable zip_with form bit-for-bit") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ida") < col("idb"))
    val diff = pairs.select(
      cosineSim(col("va"), col("vb")).as("native"),
      (Vectors.dot(col("va"), col("vb")) /
        sqrt(Vectors.dot(col("va"), col("va")) * Vectors.dot(col("vb"), col("vb"))))
        .as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("null inputs propagate; mismatched lengths use common prefix") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f, 9.9f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 1.0) // prefix [1,0]·[1,0]
    assert(got(1).isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    // Force interpreted path by evaluating the expression directly.
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5f, 0.5f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5f, -0.5f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] == 0.0)
  }

  test("SQL registration works") {
    CosineSimilarity.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0f, 0.0f), array(0.6f, 0.8f)) c")
      .head().getDouble(0)
    assert(math.abs(r - 0.6) < 1e-6) // 0.6f/0.8f aren't exact in binary
  }
}
