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

  def unpersistScope(scope: String): Unit = synchronized {
    registered.filter(_._1 == scope).foreach(_._2.unpersist(false))
    registered.filterInPlace(_._1 != scope)
  }

  def unpersistAll(): Unit = synchronized {
    registered.foreach(_._2.unpersist(false))
    registered.clear()
  }
}
