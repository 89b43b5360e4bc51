package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage curation FUNNEL: the per-ingest accounting report every
  * production corpus pipeline publishes next to its output — how many
  * documents and tokens survive each stage (ingest → quality gate →
  * exact dedup → optional near-dup), so a sudden retention shift is
  * visible as a number, not as a downstream model regression.
  *
  * Scale shape: each stage is summarized by ONE tiny aggregate (count +
  * token sum); the only shuffles beyond the quality gate's map-only pass
  * are the normalized-fingerprint min_by aggregate the dedup stage
  * already pays and the id semi-join against the caller's keep-list.
  * Output is 3-4 rows regardless of corpus size. */
object CorpusReport {

  /** Stages 0-2 as a population: quality-kept, normalized-exact-unique
    * docs (`idCol`, `text`). Exposed so a caller can build its NEAR-DUP
    * pair set over exactly the stage-2 survivors the funnel reports on —
    * then feed the resulting keep-list back via [[funnel]]'s
    * `nearDupKeep`. */
  def exactUnique(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String): DataFrame = {
    val base = docs.select(col(idCol), col(textCol).as("text"))
    val kept = base.join(
      QualityFilter(docs, idCol, textCol, langCol)
        .filter(col("keep")).select(idCol),
      Seq(idCol), "left_semi")
    // a size-1 heap per fp (Ranking.keepSmallestK), not a per-fp window:
    // a viral exact-dup (df in the millions at crawl scale) collapses in
    // map-side partial aggregates and NOTHING sorts — the dedupParagraphs
    // de-skew discipline, hash-aggregated (min_by(struct) would fall back
    // to SortAggregate and re-sort every partition)
    Ranking.keepSmallestK(
        kept.withColumn("fp",
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))),
        "fp", Seq(col(idCol)), 1)
      .drop("fp")
  }

  /** The funnel report. `nearDupKeep` (ids surviving near-dup dedup — the
    * biggest token-drop of a real curation run, e.g.
    * [[Dedup.keepCanonical]] over minhash/jaccard/semantic pairs computed
    * on [[exactUnique]]) adds a 4th `neardup_kept` stage so retention
    * accounting covers the full curation path. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             langCol: String, nearDupKeep: Option[DataFrame] = None): DataFrame = {
    val base = docs.select(col(idCol), col(textCol).as("text"))
    val kept = base.join(
      QualityFilter(docs, idCol, textCol, langCol)
        .filter(col("keep")).select(idCol),
      Seq(idCol), "left_semi")
    // same de-skewed heap canonical as exactUnique
    val uniq = Ranking.keepSmallestK(
        kept.withColumn("fp",
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))),
        "fp", Seq(col(idCol)), 1)
      .drop("fp")
    def stage(df: DataFrame, idx: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        sum(Text.tokenCount(col("text"))).as("n_tokens"))
        .select(lit(idx).cast("long").as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val core = stage(base, 0, "ingest")
      .unionByName(stage(kept, 1, "quality_kept"))
      .unionByName(stage(uniq, 2, "exact_unique"))
    nearDupKeep.fold(core) { keep =>
      core.unionByName(stage(
        uniq.join(keep.select(col(idCol)), Seq(idCol), "left_semi"),
        3, "neardup_kept"))
    }
  }

  /** Whole-funnel form owning the near-dup stage: computes the gate and
    * the exact-dedup canonical ONCE each (cached, scope "corpus" — caller
    * releases via `Caches.unpersistScope("corpus")`), builds the pair set
    * over the cached stage-2 survivors with the caller's `pairsOf`
    * (e.g. `Dedup.jaccardNearDups(_, ...)`), and reports all four
    * stages. The composed [[funnel]]+[[exactUnique]] route evaluates the
    * gate once per stage branch and the dedup canonical three times — 4
    * corpus passes this form collapses to 1 gate + 1 canonical + the
    * pair build. */
  /** `maxCandidatePairs`: pre-flight budget for the near-dup stage — the
    * heaviest stage of a real funnel run. When set, `candidateVolume`
    * (REQUIRED alongside it, e.g. [[Dedup.candidateVolumeEstimate]] with
    * the same shingleN/dfMax as your `pairsOf`) runs over the stage-2
    * survivors BEFORE any candidate pair materializes; a volume over
    * budget refuses the run by name instead of surfacing as a dead
    * cluster hours into the quadratic stage. The estimator is mandatory
    * rather than defaulted because `pairsOf` is opaque — a default with
    * its own dfMax could silently approve a run whose real parameters
    * enumerate far more pairs, the exact trap the budget exists to
    * prevent. The check is a driver-blocking aggregate at call time; its
    * shingle table persists in the "dedup" cache scope (shared with the
    * pair operator's identical plan), so a trip-path caller releases
    * BOTH scopes: `Caches.unpersistScope("corpus")` and
    * [[Dedup.unpersistIntermediates]]. */
  def funnelWithNearDup(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String,
                        pairsOf: DataFrame => DataFrame,
                        maxCandidatePairs: Option[Long] = None,
                        candidateVolume: Option[DataFrame => Long] = None): DataFrame = {
    require(maxCandidatePairs.isEmpty || candidateVolume.isDefined,
      "maxCandidatePairs needs a candidateVolume estimator built with the " +
        "same parameters as pairsOf (e.g. Dedup.candidateVolumeEstimate)")
    val f = curationFrames(docs, idCol, textCol, langCol, pairsOf)
    maxCandidatePairs.foreach { m =>
      val est = candidateVolume.get.apply(f.uniq)
      if (est > m) throw new IllegalStateException(
        s"funnel pre-flight: the near-dup stage would enumerate $est " +
          s"candidate pairs over the declared budget of $m — raise the " +
          "budget, lower dfMax, or split the corpus")
    }
    // f.comps only materializes HERE — after the budget approved the run
    val keep = graft.operators.Dedup.keepFromComponents(
      f.uniq.select(col(idCol)), idCol, f.comps)
    def stage(df: DataFrame, idx: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        sum(Text.tokenCount(col("text"))).as("n_tokens"))
        .select(lit(idx).cast("long").as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(f.base, 0, "ingest")
      .unionByName(stage(f.kept, 1, "quality_kept"))
      .unionByName(stage(f.uniq, 2, "exact_unique"))
      .unionByName(stage(
        f.uniq.join(keep.select(col(idCol)), Seq(idCol), "left_semi"),
        3, "neardup_kept"))
  }

  /** The pipeline frames the funnel and the drop audit both consume —
    * built by ONE code path so the two operators' plans are IDENTICAL
    * and the second caller cache-hits every stage: the tracked frames
    * (src/judged/kept/ranked, scope "corpus") substitute through the
    * CacheManager, and `comps` — an EAGER iterative result plan caching
    * cannot share — memoizes in [[Caches.memo]] under the canonicalized
    * pair-plan key, so funnel-then-audit (either order) runs the pair
    * build + label propagation exactly once.
    *
    * The memo lives in the "corpus" scope THIS module owns, NOT in
    * "dedup": [[Dedup.unpersistIntermediates]] fires *internally* at the
    * end of Dedup's instrumented ingestion path, and because `comps` is
    * localCheckpointed (lineage truncated), a force-free there would
    * leave any still-held reference unrecoverable — the scope invariant
    * is that one operator family's cleanup cannot drop another's
    * still-needed cache. Release contract for callers is unchanged in
    * shape: `Caches.unpersistScope("corpus")` frees these frames AND the
    * memo; [[Dedup.unpersistIntermediates]] additionally frees the pair
    * build's own "dedup"-scope shingle/index frames. */
  private[graft] final class CurationFrames(
      val src: DataFrame, val judged: DataFrame, val base: DataFrame,
      val kept: DataFrame, val ranked: DataFrame, val uniq: DataFrame,
      pairsOf: DataFrame => DataFrame) {
    /** Near-dup pairs over the stage-2 survivors. Lazy so a funnel
      * budget pre-flight can refuse the run before any pair plan runs. */
    lazy val pairs: DataFrame = pairsOf(uniq)
    /** Min-id component labels, memoized across equal-input calls. The
      * memo release frees the localCheckpointed blocks
      * ([[Dedup.freeLocalCheckpoint]]) that `Dataset.unpersist` cannot. */
    lazy val comps: DataFrame =
      Caches.memo("corpus", pairs, Dedup.freeLocalCheckpoint) {
        Dedup.components(pairs)
      }
  }

  /** Stage frames 0-2 + the dedup graph hooks, every expensive frame
    * tracked in the "corpus" cache scope. The input projection is cached
    * FIRST: the caller's `docs` is often an expensive derived corpus
    * (the bench's planted near-copies tokenize every document to build
    * themselves), and without this it is fully re-evaluated by the
    * gate's pass, the kept join's base side, and the stage-0 aggregate.
    * The exact-stage canonical is a map-combinable per-fp `min`
    * aggregate joined back on the fp (the dedupParagraphs de-skew: a
    * viral duplicate collapses in partial aggs instead of one window
    * task's sort); `ranked` carries every kept row with its group's
    * `canon`, so "survivor" is simply `id === canon` — the funnel reads
    * the survivors, the audit reads the losers with their canonical. */
  private[graft] def curationFrames(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      pairsOf: DataFrame => DataFrame): CurationFrames = {
    val src = Caches.tracked(
      docs.select(col(idCol), col(textCol), col(langCol)), "corpus")
    val judged = Caches.tracked(
      QualityFilter(src, idCol, textCol, langCol), "corpus")
    val base = src.select(col(idCol), col(textCol).as("text"))
    val kept = Caches.tracked(base.join(
      judged.filter(col("keep")).select(idCol),
      Seq(idCol), "left_semi"), "corpus")
    val withFp = kept.withColumn("fp",
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
    val mins = withFp.groupBy(col("fp")).agg(min(col(idCol)).as("canon"))
    val ranked = Caches.tracked(withFp.join(mins, Seq("fp")), "corpus")
    val uniq = ranked.filter(col(idCol) === col("canon"))
      .select(col(idCol), col("text"))
    new CurationFrames(src, judged, base, kept, ranked, uniq, pairsOf)
  }

  /** Row-level DROP AUDIT — the funnel's per-document explainability twin:
    * one row per dropped document with the stage that dropped it, the
    * reason, and (for dedup drops) the canonical survivor it lost to.
    * This is the "why is my document gone" lineage a curation run needs
    * for appeals/debugging; the aggregate [[funnelWithNearDup]] says how
    * many fell at each stage, this says WHICH and to WHOM:
    *
    *  - stage 1 `quality`: the gate's violated-rule names (fixed order,
    *    comma-joined), no canonical;
    *  - stage 2 `exact`: normalized-fingerprint duplicates, canonical =
    *    the group's minimum id (the `id === canon` survivor);
    *  - stage 3 `neardup`: non-canonical members of the caller's pair
    *    graph components ([[Dedup.components]] min-id labels).
    *
    * Scale shape: output is drop-cardinality (usually a small fraction of
    * the corpus); the operator pays exactly the funnel's own stages — the
    * map-only gate, the de-skewed per-fp min aggregate + fp join-back
    * (see [[curationFrames]]), and the caller's pair graph + components.
    * Quality/exact frames derive from "corpus"-scoped caches shared with
    * a funnel run over the same input. */
  def dropAudit(docs: DataFrame, idCol: String, textCol: String,
                langCol: String,
                pairsOf: DataFrame => DataFrame): DataFrame = {
    val f = curationFrames(docs, idCol, textCol, langCol, pairsOf)
    val qualityDrops = f.judged.filter(!col("keep"))
      .select(col(idCol), lit(1L).as("stage_idx"), lit("quality").as("stage"),
        array_join(col("reasons"), ",").as("reason"),
        lit(null).cast("long").as("canonical_id"))
    val exactDrops = f.ranked.filter(col(idCol) =!= col("canon"))
      .select(col(idCol), lit(2L).as("stage_idx"), lit("exact").as("stage"),
        lit("exact_duplicate").as("reason"),
        col("canon").as("canonical_id"))
    val nearDrops = f.comps
      .filter(col("doc") =!= col("component"))
      .select(col("doc").as(idCol), lit(3L).as("stage_idx"),
        lit("neardup").as("stage"), lit("near_duplicate").as("reason"),
        col("component").as("canonical_id"))
    qualityDrops.unionByName(exactDrops).unionByName(nearDrops)
  }
}
