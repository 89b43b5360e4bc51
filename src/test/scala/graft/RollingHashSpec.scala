package graft

import graft.plans.RollingHashMin
import graft.plans.RollingHashMin.rollingHashMin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def naive(s: String, w: Int): Long = {
    val b = s.getBytes("UTF-8")
    if (b.isEmpty) 0L
    else {
      val ww = math.min(w, b.length)
      (0 to b.length - ww).map { i =>
        b.slice(i, i + ww).foldLeft(0L)((h, x) => h * 257L + (x & 0xFF))
      }.min
    }
  }

  test("rolling update equals the naive per-window recompute") {
    val cases = Seq("", "a", "abc", "the quick brown fox", "aaaaaaa",
      "unicode: déjà vu ünïcødë", "x" * 200)
    for (s <- cases; w <- Seq(1, 4, 16, 64)) {
      assert(RollingHashMin.minHash(UTF8String.fromString(s), w) == naive(s, w),
        s"w=$w input=<${s.take(30)}>")
    }
  }

  test("dedup property: identical docs agree, shifted docs mostly agree") {
    val doc = "spark engines dedup documents with rolling hashes at scale " * 4
    val same = RollingHashMin.minHash(UTF8String.fromString(doc), 16)
    assert(RollingHashMin.minHash(UTF8String.fromString(doc), 16) == same)
    // prepending text keeps the minimum window unless a smaller one appears
    val shifted = RollingHashMin.minHash(UTF8String.fromString("PREFIX " + doc), 16)
    assert(shifted <= same) // min over a superset of windows
  }

  test("column form is deterministic over the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = docs.select(col("doc_id"), rollingHashMin(col("text"), 32).as("f"))
      .orderBy("doc_id").collect().toSeq
    val b = docs.select(col("doc_id"), rollingHashMin(col("text"), 32).as("f"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(1)).distinct.size > 400) // discriminative
  }
}
