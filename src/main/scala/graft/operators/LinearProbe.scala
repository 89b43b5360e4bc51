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

  // ---- hashed-feature probe (r15) -----------------------------------
  // The real gate-distillation shape: a linear model over HASHED
  // bag-of-words features (Vectors.hashedBow — Weinberger et al. 2009)
  // instead of 5 hand signals. Same squared loss, same fixed-point
  // gradient discipline; what changes is the gradient's SHAPE — d+1 sums
  // don't fit a wide-accumulator agg once d grows, so each round is ONE
  // aggregate over exploded (bucket, value) pairs, keyed by bucket:
  // d+1 output rows whatever d is, the layout that survives d = 2^18.

  /** Hashed-BoW features + the gate label: (idCol, z ARRAY<DOUBLE>, y).
    * z_j = signed bucket count / max(n_tokens, 1) — |z|₁ ≤ 1 by
    * construction, which also bounds the GD spectral constant (row
    * ‖x‖² ≤ 2 with the bias, so any lr < 1 is stable). Every value is a
    * fixed chain: exact BIGINT counts, one exact division. The
    * label join is id-grain between two map-only derivations of the
    * same scan — ephemera next to the corpus read. */
  def bowFeatures(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String, dim: Int = 32): DataFrame = {
    val gate = QualityFilter(docs, idCol, textCol, langCol).select(
      col(idCol),
      when(col("keep"), lit(1.0d)).otherwise(lit(0.0d)).as("y"))
    Vectors.hashedBow(docs, idCol, textCol, dim)
      .select(col(idCol),
        transform(col("vec"), v => v.cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double")).as("z"))
      .join(gate, Seq(idCol))
  }

  /** `iters` full-batch GD steps from w = 0 over (z ARRAY<DOUBLE>, y).
    * The per-row prediction is the in-row left fold
    * `((b + w₀z₀) + w₁z₁) + …` against the weight LITERAL (the codebook
    * discipline); the gradient is one aggregate over
    * `posexplode(z ++ [1])` keyed by bucket — bucket `dim` is the bias —
    * collected as d+1 BIGINT rows. Fixed-point, partition-invariant,
    * plans constant-size across iterations: [[fit]]'s contract at any
    * dimensionality. */
  def fitBow(feats: DataFrame, dim: Int, iters: Int = 8, lr: Double = 0.25)
      : (Seq[Double], Double) = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val n = feats.count().toDouble
    require(n > 0, "LinearProbe.fitBow: empty features frame")
    var w = Seq.fill(dim)(0.0d)
    var b = 0.0d
    for (_ <- 1 to iters) {
      val err = (bowPred(w, b) - col("y")).as("err")
      val g = feats.select(err,
          posexplode(concat(col("z"), array(lit(1.0d)))))
        .groupBy(col("pos"))
        .agg(sum(floor(col("err") * col("col") * lit(Scale)).cast("long"))
          .as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (g.getOrElse(j, 0L).toDouble / Scale / n)
      }
      b = b - lr * (g.getOrElse(dim, 0L).toDouble / Scale / n)
    }
    (w, b)
  }

  /** The in-row prediction fold shared by [[fitBow]] and [[scoreBow]]. */
  private def bowPred(w: Seq[Double], b: Double): org.apache.spark.sql.Column =
    aggregate(zip_with(col("z"), typedLit(w), (zj, wj) => zj * wj),
      lit(b), (acc, t) => acc + t)

  /** Map-only scoring with a trained BoW probe — [[score]]'s shape:
    * (idCol, gate_keep, score_c fixed-point BIGINT). */
  def scoreBow(feats: DataFrame, idCol: String, w: Seq[Double], b: Double)
      : DataFrame =
    feats.select(col(idCol),
      (col("y") === 1.0d).as("gate_keep"),
      floor(bowPred(w, b) * lit(Scale)).cast("long").as("score_c"))

  /** The BoW oracle's training replay over a `feats` CTE exposing
    * (doc_id, z LIST(DOUBLE) of length `dim`, y): per round one
    * bucket-keyed gradient CTE over the aligned double-unnest of
    * `list_append(z, 1)` (bucket `dim` = bias), one per-bucket update,
    * and the re-assembled weight list — mirroring [[fitBow]]'s chains
    * textually (`list_prepend(b, …)` reduce == the seeded left fold). */
  def oracleBowCtes(dim: Int, iters: Int, lr: Double = 0.25): String = {
    def predSql(w: String) =
      s"list_reduce(list_prepend($w.b, list_transform(list_zip(z, $w.w), " +
        "p -> p[1] * p[2])), (a, x) -> a + x)"
    val wt0 =
      s"""wt0 AS MATERIALIZED (
         |  SELECT list_transform(generate_series(1, $dim),
         |    i -> CAST(0 AS DOUBLE)) AS w, CAST(0 AS DOUBLE) AS b)""".stripMargin
    val rounds = (1 to iters).map { t =>
      val p = predSql("w")
      s"""g$t AS MATERIALIZED (
         |  SELECT pos,
         |    CAST(sum(CAST(floor(err * zv * 1048576.0) AS BIGINT)) AS BIGINT)
         |      AS g,
         |    count(*) AS cnt
         |  FROM (
         |    SELECT ($p - y) AS err,
         |      unnest(generate_series(0, $dim)) AS pos,
         |      unnest(list_append(z, CAST(1 AS DOUBLE))) AS zv
         |    FROM feats CROSS JOIN wt${t - 1} w)
         |  GROUP BY pos),
         |wu$t AS MATERIALIZED (
         |  SELECT g.pos,
         |    (CASE WHEN g.pos < $dim THEN w.w[g.pos + 1] ELSE w.b END)
         |      - (CAST($lr AS DOUBLE) * ((CAST(g.g AS DOUBLE) / 1048576.0)
         |        / CAST(g.cnt AS DOUBLE))) AS nv
         |  FROM g$t g CROSS JOIN wt${t - 1} w),
         |wt$t AS MATERIALIZED (
         |  SELECT (SELECT list(nv ORDER BY pos) FROM wu$t WHERE pos < $dim)
         |    AS w,
         |    (SELECT nv FROM wu$t WHERE pos = $dim) AS b)""".stripMargin
    }
    (wt0 +: rounds).mkString(",\n")
  }

  /** Final BoW oracle projection: every doc scored by wt$iters. */
  def oracleBowScoreSelect(iters: Int): String =
    s"""SELECT doc_id, y = CAST(1 AS DOUBLE) AS gate_keep,
       |  CAST(floor((list_reduce(list_prepend(w.b,
       |    list_transform(list_zip(z, w.w), p -> p[1] * p[2])),
       |    (a, x) -> a + x)) * 1048576.0) AS BIGINT) AS score_c
       |FROM feats CROSS JOIN wt$iters w
       |ORDER BY doc_id""".stripMargin

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
