package graft

import graft.operators.LinearProbe
import org.apache.spark.sql.functions._

/** [[LinearProbe]] — gate distillation. Load-bearing properties: the
  * distributed fixed-point training equals a sequential plain-Scala
  * replay BITWISE (the partition-invariance the fixed-point gradient
  * exists for), the learned scorer separates the gate's keeps from its
  * drops on a planted corpus, and scoring carries the gate label
  * through for auditability. */
class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: clean English prose (keeps) vs punct-flood junk and
  // one-token stubs (drops) — crisply separable in the gate's signals
  private lazy val docs = ((1 to 12).map { i =>
    (i.toLong, ("the quick brown fox jumps over the lazy dog again and " +
      s"then sentence number $i follows with plain words here"), "en")
  } ++ (13 to 18).map { i =>
    (i.toLong, "!!! ??? *** %%% $$$ ### @@@ ^^^ &&& " * 4, "en")
  } ++ (19 to 24).map { i =>
    (i.toLong, "stub", "en")
  }).toDF("doc_id", "text", "lang")

  test("distributed fixed-point training == sequential replay, bitwise") {
    val feats = LinearProbe.gateFeatures(docs, "doc_id", "text", "lang")
    val (w, b) = LinearProbe.fit(feats, iters = 6, lr = 0.25)
    // sequential replay over collected rows: fixed-point longs sum
    // exactly in ANY order, so a single-threaded fold must land on the
    // identical weights — bitwise, not within epsilon
    val rows = feats.select("z0", "z1", "z2", "z3", "z4", "y").collect()
      .map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)), r.getDouble(5)))
    val n = rows.length.toDouble
    var rw = Array.fill(5)(0.0d); var rb = 0.0d
    for (_ <- 1 to 6) {
      val g = Array.fill(6)(0L)
      rows.foreach { case (z, y) =>
        var pred = rb
        var j = 0
        while (j < 5) { pred = pred + rw(j) * z(j); j += 1 }
        val err = pred - y
        j = 0
        while (j < 5) {
          g(j) += math.floor(err * z(j) * 1048576.0d).toLong; j += 1
        }
        g(5) += math.floor(err * 1048576.0d).toLong
      }
      rw = rw.zipWithIndex.map { case (wj, j) =>
        wj - 0.25d * (g(j).toDouble / 1048576.0d / n)
      }
      rb = rb - 0.25d * (g(5).toDouble / 1048576.0d / n)
    }
    assert(w.toArray.sameElements(rw), s"w=$w rw=${rw.toSeq}")
    assert(b === rb)
    // and training is partition-invariant: the same corpus through a
    // different partitioning lands on the same bits
    val (w13, b13) = LinearProbe.fit(
      LinearProbe.gateFeatures(docs.repartition(13), "doc_id", "text", "lang"),
      iters = 6, lr = 0.25)
    assert(w13 === w && b13 === b)
  }

  test("the learned scorer separates gate keeps from gate drops") {
    val feats = LinearProbe.gateFeatures(docs, "doc_id", "text", "lang")
    val (w, b) = LinearProbe.fit(feats, iters = 8, lr = 0.25)
    val scored = LinearProbe.score(feats, "doc_id", w, b)
    val kept = scored.filter(col("gate_keep")).agg(avg("score_c")).head.getDouble(0)
    val dropped = scored.filter(!col("gate_keep")).agg(avg("score_c")).head.getDouble(0)
    assert(kept > dropped,
      s"no separation after 8 iters: keeps avg $kept, drops avg $dropped")
    // labels ride through from the gate verbatim
    val nKeep = scored.filter(col("gate_keep")).count()
    assert(nKeep === 12L, s"expected the 12 prose docs kept, got $nKeep")
  }

  test("fit refuses an empty frame and zero iterations by name") {
    val feats = LinearProbe.gateFeatures(docs, "doc_id", "text", "lang")
    assertThrows[IllegalArgumentException](
      LinearProbe.fit(feats, iters = 0))
    assertThrows[IllegalArgumentException](
      LinearProbe.fit(feats.filter(col("y") > 2.0d), iters = 2))
  }

  // ---- hashed-BoW probe (r15) ---------------------------------------

  test("BoW training == sequential replay bitwise, and is partition-invariant") {
    val dim = 32
    val feats = LinearProbe.bowFeatures(docs, "doc_id", "text", "lang", dim)
    val (w, b) = LinearProbe.fitBow(feats, dim, iters = 6, lr = 0.25)
    val rows = feats.select("z", "y").collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val n = rows.length.toDouble
    var rw = Array.fill(dim)(0.0d); var rb = 0.0d
    for (_ <- 1 to 6) {
      val g = Array.fill(dim + 1)(0L)
      rows.foreach { case (z, y) =>
        var pred = rb
        var j = 0
        while (j < dim) { pred = pred + z(j) * rw(j); j += 1 }
        val err = pred - y
        j = 0
        while (j < dim) {
          g(j) += math.floor(err * z(j) * 1048576.0d).toLong; j += 1
        }
        g(dim) += math.floor(err * 1.0d * 1048576.0d).toLong
      }
      rw = rw.zipWithIndex.map { case (wj, j) =>
        wj - 0.25d * (g(j).toDouble / 1048576.0d / n)
      }
      rb = rb - 0.25d * (g(dim).toDouble / 1048576.0d / n)
    }
    assert(w.toArray.sameElements(rw), s"w=$w rw=${rw.toSeq}")
    assert(b === rb)
    val (w13, b13) = LinearProbe.fitBow(
      LinearProbe.bowFeatures(docs.repartition(13), "doc_id", "text", "lang",
        dim), dim, iters = 6, lr = 0.25)
    assert(w13 === w && b13 === b)
  }

  test("BoW probe separates planted good docs from bad ones completely") {
    // the hashed features SEE the words themselves (prose tokens land in
    // different buckets than the junk glyphs), so on this crisply-planted
    // corpus the separation bar is total: min kept score > max dropped
    val dim = 32
    val feats = LinearProbe.bowFeatures(docs, "doc_id", "text", "lang", dim)
    val (w, b) = LinearProbe.fitBow(feats, dim, iters = 8, lr = 0.25)
    val scored = LinearProbe.scoreBow(feats, "doc_id", w, b)
    val minKept = scored.filter(col("gate_keep"))
      .agg(min("score_c")).head.getLong(0)
    val maxDropped = scored.filter(!col("gate_keep"))
      .agg(max("score_c")).head.getLong(0)
    assert(minKept > maxDropped,
      s"BoW probe failed to separate: min kept $minKept <= max dropped $maxDropped")
    assert(scored.filter(col("gate_keep")).count() === 12L)
  }
}
