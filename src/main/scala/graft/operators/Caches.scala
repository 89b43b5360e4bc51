package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared registry for DataFrames persisted INSIDE lazy operator builders
  * ([[Dedup]] signature/bucket tables, [[Ivf]] corpus + centroid frames).
  *
  * The returned results are lazy, so a builder cannot eagerly unpersist
  * its own intermediates without defeating the cache it just created.
  * Long-lived sessions (the CLI loop, `Bench` iterations, test suites)
  * call [[unpersistAll]] once results are materialized, so repeated
  * operator invocations don't accumulate cached blocks until executor
  * storage evicts under pressure. */
object Caches {
  private val registered =
    new scala.collection.mutable.ArrayBuffer[(String, DataFrame)]

  /** `scope` partitions ownership so one operator family's cleanup cannot
    * drop another's still-needed cache (e.g. Dedup.unpersistIntermediates
    * must not evict a TextSources.quarantine parse that the caller's bad
    * side still reads from). */
  def tracked(df: DataFrame, scope: String = "misc"): DataFrame = synchronized {
    val p = df.persist()
    registered += scope -> p
    p
  }

  /** Register a frame that is ALREADY persisted (e.g. an iteratively
    * materialized table whose siblings were eagerly dropped). */
  def register(df: DataFrame, scope: String = "misc"): DataFrame = synchronized {
    registered += scope -> df
    df
  }

  // -------------------------------------------------------- result memo

  /** EAGER-operator results keyed by the canonicalized logical plan of
    * their input: (scope, key, result, release). Plan-level CacheManager
    * substitution cannot share these — an iterative operator like
    * [[Dedup.components]] runs its convergence loop at CALL time and
    * returns a localCheckpointed frame, so a second equal-input call
    * re-pays every round even when all its inputs are cached. */
  private val memoized = new scala.collection.mutable.ArrayBuffer[(
    String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    DataFrame, DataFrame => Unit)]

  /** Memoize `build`'s result under the canonicalized ANALYZED plan of
    * `key`: a later call whose key canonicalizes equal returns the same
    * result frame without re-running the operator. Opt-in per call site
    * (NOT inside the operator itself): memoization is only sound when
    * the underlying data cannot change between equal-plan calls within
    * the scope's lifetime — callers over mutable stores (streaming
    * ingest epochs) must not route through this. `release` frees the
    * result on scope release (localCheckpointed frames need their RDD
    * blocks freed explicitly — `Dataset.unpersist` is a no-op on them).
    * `build` runs OUTSIDE the lock (it may run long Spark jobs); two
    * racing builders may both run, and both results are then released
    * with the scope — wasteful, never wrong. */
  def memo(scope: String, key: DataFrame,
           release: DataFrame => Unit = _.unpersist(false))
          (build: => DataFrame): DataFrame = {
    val k = key.queryExecution.analyzed.canonicalized
    synchronized {
      memoized.collectFirst { case (s, `k`, df, _) if s == scope => df }
    } match {
      case Some(hit) => hit
      case None =>
        val built = build
        synchronized { memoized += ((scope, k, built, release)) }
        built
    }
  }

  /** True iff an equal-key memo entry exists (spec hook for asserting a
    * second caller will cache-hit, without exposing the entry). */
  private[graft] def memoHit(scope: String, key: DataFrame): Boolean = {
    val k = key.queryExecution.analyzed.canonicalized
    synchronized { memoized.exists(e => e._1 == scope && e._2 == k) }
  }

  def unpersistScope(scope: String): Unit = synchronized {
    registered.filter(_._1 == scope).foreach(_._2.unpersist(false))
    registered.filterInPlace(_._1 != scope)
    memoized.filter(_._1 == scope).foreach(e => e._4(e._3))
    memoized.filterInPlace(_._1 != scope)
  }

  def unpersistAll(): Unit = synchronized {
    registered.foreach(_._2.unpersist(false))
    registered.clear()
    memoized.foreach(e => e._4(e._3))
    memoized.clear()
  }
}
