package graft

import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Training-data pipeline ops: deterministic sampling/splits and sequence
  * packing. */
class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map(i => (i.toLong, 1L + rnd.nextInt(300).toLong))
      .toDF("doc_id", "n_tokens")
  }

  test("hash split is stable under repartitioning and roughly proportioned") {
    val d = docs(2000, 1)
    val s1 = Sampling.split(d, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val s2 = Sampling.split(d.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(s1 == s2) // membership does not depend on layout
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("val") - 0.10) < 0.03)
    assert(math.abs(frac("test") - 0.10) < 0.03)
    assert(math.abs(frac("train") - 0.80) < 0.05)
  }

  test("stratified sample keeps rate-0 strata empty and full-rate strata whole") {
    val d = docs(300, 2).withColumn("lang",
      when(col("doc_id") % 3 === 0, "en").when(col("doc_id") % 3 === 1, "zh")
        .otherwise("de"))
    val kept = Sampling.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 5000, "zh" -> 10000)).collect()
    val byLang = kept.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("de", 0) == 0)  // absent stratum dropped
    assert(byLang("zh") == 100)             // rate 10000 = keep all
    assert(byLang("en") > 20 && byLang("en") < 80) // ~50%
  }

  test("greedy packing never exceeds the budget; chunked matches its oracle shape") {
    val d = docs(500, 3)
    val g = Packing.greedy(d, "doc_id", "n_tokens", seqLen = 512, shards = 4)
    val packTotals = g.groupBy("pack_id").agg(
      sum("n_tokens").as("total"), count(lit(1)).as("n"), max("n_tokens").as("mx"))
      .collect()
    // a pack exceeds the budget only when it is a single oversized doc
    assert(packTotals.forall(r =>
      r.getAs[Long]("total") <= 512 || r.getAs[Long]("n") == 1L))
    // every doc is packed exactly once
    assert(g.count() == 500 && g.select("doc_id").distinct().count() == 500)
    // determinism
    val g2 = Packing.greedy(d.repartition(11), "doc_id", "n_tokens", 512, 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    val g1 = g.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    assert(g1 == g2)

    val c = Packing.chunked(d, "doc_id", "n_tokens", seqLen = 512, shards = 4)
    // same shard layout; chunked packs are contiguous in doc order
    assert(c.count() == 500)
    val perShard = c.groupBy("shard").agg(countDistinct("pack_id")).collect()
    assert(perShard.length == 4)
  }

  test("greedy pack count sits between the token lower bound and 2x") {
    val d = docs(400, 4)
    val nGreedy = Packing.greedy(d, "doc_id", "n_tokens", 512, 4)
      .select("pack_id").distinct().count()
    // chunked ignores fit (docs straddle boundaries), so its count is the
    // ceil(total/512) lower bound that honest packing cannot beat...
    val nChunked = Packing.chunked(d, "doc_id", "n_tokens", 512, 4)
      .select("pack_id").distinct().count()
    assert(nGreedy >= nChunked)
    // ...and in-order first-fit wastes at most half each closed pack:
    // a closed pack plus the item that closed it exceeds the budget
    assert(nGreedy <= 2 * nChunked + 4) // +1 per shard tail
  }
}
