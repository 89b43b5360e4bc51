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
  private val registered = new scala.collection.mutable.ArrayBuffer[DataFrame]

  def tracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    registered += p
    p
  }

  /** Register a frame that is ALREADY persisted (e.g. an iteratively
    * materialized table whose siblings were eagerly dropped). */
  def register(df: DataFrame): DataFrame = synchronized {
    registered += df
    df
  }

  def unpersistAll(): Unit = synchronized {
    registered.foreach(_.unpersist(false))
    registered.clear()
  }
}
