package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distill the rule-based quality gate into a LEARNED linear scorer —
  * the classifier step of a CCNet/fastText-style curation pipeline: the
  * hard keep/drop gate gives binary labels, a linear probe trained on
  * the gate's own signals turns them into a graded score usable for
  * soft mixing, threshold sweeps, and ranking-by-quality — the standard
  * "bootstrap a classifier from heuristics" move (CCNet trains its
  * quality model against Wikipedia-vs-crawl labels; here the teacher is
  * the in-engine gate, so the whole loop is self-contained and exact).
  *
  * Training is full-batch gradient descent on SQUARED loss —
  * deliberately not logistic: a sigmoid inside the update would put a
  * transcendental (`exp`, libm-dependent last ulp) in the learned
  * weights and break cross-engine bit-parity, while the least-squares
  * gradient is all +/× — so every quantity in training is a fixed
  * chain of correctly rounded IEEE ops:
  *
  *  - features are the gate's five signals, each already an exact
  *    mirrored chain (`q_quality_filter`'s oracle), rescaled into [0,1]
  *    by constant divisions;
  *  - the per-iteration gradient — the ONE order-dependent sum — is
  *    floored to 2^-20 fixed point per row and summed as BIGINT (the
  *    DSIR/centroid discipline), so it is identical under any
  *    partitioning (magnitude bound: |err·z| stays O(10), so the sums
  *    hold exactly to ~10^12 rows per batch — size batches or rescale
  *    past that);
  *  - the weight update `w − lr·((g/2^20)/n)` is one parenthesized
  *    double chain the oracle mirrors textually;
  *  - each iteration starts from the previous weights embedded as
  *    LITERALS (the Lloyd/PQ plan-size discipline): plans stay
  *    constant-size, the barrier is the 1-row gradient collect.
  *
  * Scale shape: the features frame is map-only off the corpus scan and
  * is consumed once per iteration — `iters` full passes — so callers
  * persist it ([[Caches.tracked]], scope "probe"): unlike the
  * single-reuse frames the persist rule excludes, T-fold reuse repays
  * the cache at any T ≥ 2. Each iteration is ONE aggregate emitting
  * d+1 BIGINT sums (wide-accumulator shape — no per-feature explode),
  * collected to the driver (d+1 longs — the codebook-style
  * driver-bounded structure). Scoring is map-only.
  *
  * The DuckDB oracle replays training end-to-end: the gate-signal CTEs
  * (shared with q_quality_filter), T pairs of MATERIALIZED (gradient,
  * weights) CTEs — materialization is load-bearing for the same
  * inlining reason as the BPE replay — and the final fixed-point score
  * projection, so `q_quality_probe` checks the LEARNED MODEL through
  * every document's score. */
object LinearProbe {

  private val Scale = 1048576.0d // 2^-20 — the repo's fixed-point unit

  /** Bounded [≈0,1] features + the 0/1 gate label, every column an exact
    * chain the quality oracle already mirrors. Output: (idCol, z0..z4, y). */
  def gateFeatures(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String): DataFrame =
    QualityFilter(docs, idCol, textCol, langCol).select(
      col(idCol),
      (least(col("n_tokens"), lit(1000L)).cast("double") / lit(1000.0d))
        .as("z0"),
      (col("mean_word_len") / lit(12.0d)).as("z1"),
      col("punct_ratio").as("z2"),
      col("stopword_ratio").as("z3"),
      col("alpha_ratio").as("z4"),
      when(col("keep"), lit(1.0d)).otherwise(lit(0.0d)).as("y"))

  /** `iters` full-batch GD steps from w = 0 on squared loss over
    * (z0..z4, y). Returns (weights w0..w4, bias). `lr` defaults to 0.25
    * — under the 2/L stability bound for d=6 features in [0,1]. */
  def fit(feats: DataFrame, iters: Int = 8, lr: Double = 0.25)
      : (Seq[Double], Double) = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val n = feats.count().toDouble
    require(n > 0, "LinearProbe.fit: empty features frame")
    var w = Seq.fill(5)(0.0d)
    var b = 0.0d
    for (_ <- 1 to iters) {
      // prediction chain: ((((b + w0·z0) + w1·z1) + …) — left-assoc,
      // mirrored textually by the oracle
      val pred = (0 until 5).foldLeft(lit(b): org.apache.spark.sql.Column) {
        (acc, j) => acc + lit(w(j)) * col(s"z$j")
      }
      val err = pred - col("y")
      val aggs = (0 until 5).map(j =>
        sum(floor(err * col(s"z$j") * lit(Scale)).cast("long")).as(s"g$j")) :+
        sum(floor(err * lit(Scale)).cast("long")).as("gb")
      val r = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (r.getLong(j).toDouble / Scale / n)
      }
      b = b - lr * (r.getLong(5).toDouble / Scale / n)
    }
    (w, b)
  }

  /** Map-only scoring with a trained probe: the same prediction chain,
    * emitted as an order-free fixed-point BIGINT. Output: (idCol, y
    * relabeled gate_keep for auditability, score_c). */
  def score(feats: DataFrame, idCol: String, w: Seq[Double], b: Double)
      : DataFrame = {
    val pred = (0 until 5).foldLeft(lit(b): org.apache.spark.sql.Column) {
      (acc, j) => acc + lit(w(j)) * col(s"z$j")
    }
    feats.select(col(idCol),
      (col("y") === 1.0d).as("gate_keep"),
      floor(pred * lit(Scale)).cast("long").as("score_c"))
  }

  /** The oracle's training replay over a `feats` CTE exposing
    * (doc_id, z0..z4, y): T MATERIALIZED (g$t, wt$t) CTE pairs starting
    * from the zero-weight wt0 — the caller appends a final projection
    * over `wt$iters` (see [[oracleScoreSelect]]). `lr` and the chains
    * mirror [[fit]] textually. */
  def oracleCtes(iters: Int, lr: Double = 0.25): String = {
    def predSql(src: String) =
      (0 until 5).foldLeft(s"$src.b") { (acc, j) =>
        s"($acc + $src.w$j * z$j)"
      }
    val wt0 =
      """wt0 AS MATERIALIZED (
        |  SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
        |    CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3,
        |    CAST(0 AS DOUBLE) AS w4, CAST(0 AS DOUBLE) AS b)""".stripMargin
    val rounds = (1 to iters).map { t =>
      val p = predSql("w")
      val gs = (0 until 5).map(j =>
        s"CAST(sum(CAST(floor((($p - y) * z$j) * 1048576.0) AS BIGINT)) AS BIGINT) AS g$j")
        .mkString(",\n    ")
      val upd = (0 until 5).map(j =>
        s"w.w$j - (CAST($lr AS DOUBLE) * ((CAST(g.g$j AS DOUBLE) / 1048576.0) / CAST(g.cnt AS DOUBLE))) AS w$j")
        .mkString(",\n    ")
      s"""g$t AS MATERIALIZED (
         |  SELECT $gs,
         |    CAST(sum(CAST(floor(($p - y) * 1048576.0) AS BIGINT)) AS BIGINT) AS gb,
         |    count(*) AS cnt
         |  FROM feats CROSS JOIN wt${t - 1} w),
         |wt$t AS MATERIALIZED (
         |  SELECT $upd,
         |    w.b - (CAST($lr AS DOUBLE) * ((CAST(g.gb AS DOUBLE) / 1048576.0) / CAST(g.cnt AS DOUBLE))) AS b
         |  FROM wt${t - 1} w CROSS JOIN g$t g)""".stripMargin
    }
    (wt0 +: rounds).mkString(",\n")
  }

  /** Final oracle projection: every doc scored by the learned wt$iters. */
  def oracleScoreSelect(iters: Int): String = {
    val p = (0 until 5).foldLeft("w.b") { (acc, j) =>
      s"($acc + w.w$j * z$j)"
    }
    s"""SELECT doc_id, y = CAST(1 AS DOUBLE) AS gate_keep,
       |  CAST(floor(($p) * 1048576.0) AS BIGINT) AS score_c
       |FROM feats CROSS JOIN wt$iters w
       |ORDER BY doc_id""".stripMargin
  }
}
