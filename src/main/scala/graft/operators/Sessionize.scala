package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (beyond-reference; the standard event-stream
  * operator). Works on millisecond longs so ordering and gap comparisons
  * are integer-exact (see SparkEntry's oracle-parity rules).
  *
  * One shuffle on the session key; session ids are a running sum of
  * gap-break flags inside the keyed window — the same plan a 1000-executor
  * cluster wants (no per-user collect, no UDAF state).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) to each event. `tsMs` must be
    * epoch millis; `tieBreak` makes simultaneous events deterministic. */
  def assign(events: DataFrame, keyCols: Seq[String], tsMs: Column,
             tieBreak: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(tsMs, tieBreak)
    events
      .withColumn("_gap_ms", tsMs - lag(tsMs, 1).over(w))
      .withColumn("session_seq",
        (lit(1L) + sum(when(col("_gap_ms") > gapMs, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .drop("_gap_ms")
  }

  /** Per-key session count (the q_sessionize shape). */
  def countSessions(events: DataFrame, keyCols: Seq[String], tsMs: Column,
                    tieBreak: Column, gapMs: Long): DataFrame =
    assign(events, keyCols, tsMs, tieBreak, gapMs)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("session_seq")).as("n_sessions"))

  /** Session-level rollup: bounds + event count + value sum per session. */
  def sessionStats(events: DataFrame, keyCols: Seq[String], tsMs: Column,
                   tieBreak: Column, gapMs: Long, valueCents: Column): DataFrame =
    assign(events.withColumn("_v", valueCents), keyCols, tsMs, tieBreak, gapMs)
      .groupBy((keyCols.map(col) :+ col("session_seq")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(tsMs).as("session_start_ms"),
        max(tsMs).as("session_end_ms"),
        sum(col("_v")).as("total_value_cents"))
}
