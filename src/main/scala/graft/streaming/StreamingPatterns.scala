package graft.streaming

import java.sql.Timestamp
import graft.functions.Normalize
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.10: the streaming face of the pattern engine.
  *
  * The reference is batch-only; its incremental enrich
  * (`cache_manager.py:591-607`) is semantically a keyed stateful aggregate.
  * Because every A1 aggregate is decomposable (sum/min/max/set-union), the
  * SAME logical computation runs three ways:
  *  - batch: `Patterns.aggregate`;
  *  - incremental batch: `Patterns.merge` (union + re-agg);
  *  - streaming: the stateful flatMapGroups below / windowed agg.
  */
object StreamingPatterns {

  /** Streaming-friendly input row (a projection of QueryLog). */
  final case class LogEvent(
      query: String,
      user: String,
      query_start_time: Timestamp,
      query_duration_ms: Double,
      memory_usage: Long)

  /** Running per-pattern state — the reference's `QueryPattern`
    * merge fields (`models.py:135-154`). */
  final case class PatternState(
      pattern_id: String,
      frequency: Long,
      total_duration_ms: Double,
      first_seen: Timestamp,
      last_seen: Timestamp,
      users: Set[String],
      memory_usage: Long)

  def emptyState(id: String): PatternState =
    PatternState(id, 0L, 0.0, null, null, Set.empty, 0L)

  /** The per-batch state transition (exposed for unit tests — the
    * streaming wiring below just applies it). Mirrors
    * `QueryPattern.update_from_log` (`models.py:113-133`). */
  def updateState(state: PatternState, events: Iterator[LogEvent]): PatternState =
    events.foldLeft(state) { (s, e) =>
      PatternState(
        s.pattern_id,
        s.frequency + 1,
        s.total_duration_ms + e.query_duration_ms,
        if (s.first_seen == null || e.query_start_time.before(s.first_seen))
          e.query_start_time else s.first_seen,
        if (s.last_seen == null || e.query_start_time.after(s.last_seen))
          e.query_start_time else s.last_seen,
        s.users + e.user,
        s.memory_usage + e.memory_usage)
    }

  final case class KeyedEvent(
      query: String, user: String, query_start_time: Timestamp,
      query_duration_ms: Double, memory_usage: Long, pattern_id: String)

  /** Stateful streaming pattern aggregation: groupByKey(pattern hash) +
    * mapGroupsWithState, output mode Update — each micro-batch emits the
    * refreshed `PatternState` for patterns that saw events. */
  def statefulPatterns(logs: Dataset[LogEvent]): Dataset[PatternState] = {
    import logs.sparkSession.implicits._
    logs
      .withColumn("pattern_id", Normalize.fingerprint(col("query")))
      .as[KeyedEvent]
      .groupByKey(_.pattern_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (id: String, rows: Iterator[KeyedEvent], state: GroupState[PatternState]) =>
          val prev = state.getOption.getOrElse(emptyState(id))
          val next = updateState(prev,
            rows.map(r => LogEvent(r.query, r.user, r.query_start_time,
              r.query_duration_ms, r.memory_usage)))
          state.update(next)
          next
      }
  }

  /** Streaming per-group cap — the stateful face of
    * [[graft.operators.Sampling.groupCap]]: each group's state holds the
    * md5-rank LEAST-n row ids seen so far, so after any prefix of the
    * stream the kept set is exactly what batch groupCap would select
    * over the rows delivered so far — INDEPENDENT of arrival order,
    * micro-batch boundaries, and redeliveries (duplicate ids fold
    * idempotently into the set). A first-come-first-kept cap would tie
    * survival to scheduling nondeterminism; ranking by the same
    * content-derived md5 key as the batch operator makes the streaming
    * and batch answers one fixed point, which is what lets a crawl
    * pipeline enforce per-domain budgets incrementally and still match
    * its own batch re-run.
    *
    * State is O(n) ids PER GROUP but the GROUP COUNT is unbounded: with
    * registrable domains as groups (the advertised crawl use), a
    * long-running stream accretes one state entry per domain ever seen,
    * forever — unlike the watermark-bounded [[streamingDedup]] next
    * door. For bounded deployments pass `idleRetention` (a duration,
    * e.g. "7 days"): a group idle past it has its state evicted on a
    * later batch via a processing-time timeout. The TRADE is explicit —
    * an evicted group that reappears restarts its cap from empty, so
    * batch-equivalence then holds per retention epoch, not over the
    * whole stream history. Default (None) keeps the exact fixed point
    * and the unbounded-group caveat.
    *
    * Emits each group's full current kept set on every batch it appears
    * in (update semantics); pair with `outputMode("update")` and a sink
    * that upserts by group. NOTE the memory sink APPENDS updates rather
    * than upserting — a multi-batch reader of that sink must take each
    * group's latest emission (equivalently: the md5-least n of all its
    * emitted ids, since emissions only shrink toward the global
    * least-n — StreamingSpec derives final state exactly that way). */
  def streamingGroupCap(pairs: DataFrame, idCol: String, groupCol: String,
                        n: Int,
                        idleRetention: Option[String] = None): Dataset[(String, Long)] = {
    import pairs.sparkSession.implicits._
    val timeoutConf = if (idleRetention.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    pairs
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        md5(concat(lit("cap:"), col(idCol).cast("string"))).as("k"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(String, Long)], (String, Long)](
        OutputMode.Update, timeoutConf) {
        (group: String, rows: Iterator[(String, Long, String)],
         state: GroupState[Seq[(String, Long)]]) =>
          if (state.hasTimedOut) {
            // idle past retention: drop the group's state; its kept set
            // was already emitted — nothing new to say
            state.remove()
            Iterator.empty
          } else {
            val merged = (state.getOption.getOrElse(Seq.empty) ++
                rows.map(r => (r._3, r._2)))
              .distinct.sorted.take(n)
            state.update(merged)
            idleRetention.foreach(state.setTimeoutDuration)
            merged.iterator.map { case (_, id) => (group, id) }
          }
      }
  }

  /** Streaming exact dedup with BOUNDED state: duplicates arriving within
    * the watermark horizon are dropped, and key state older than the
    * watermark is evicted — the streaming face of
    * [[graft.operators.Dedup.exactGroups]] that can run forever. */
  def streamingDedup(logs: DataFrame, idCols: Seq[String],
                     eventTimeCol: String, watermark: String): DataFrame =
    logs.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stateful pattern aggregation WITH eviction: a pattern idle past
    * `idleGapMs` (by event time, gated on the watermark) is emitted once
    * as final and its state removed — unbounded-stream-safe, unlike
    * [[statefulPatterns]] which keeps state forever. */
  def expiringPatterns(logs: Dataset[LogEvent], watermark: String = "1 hour",
                       idleGapMs: Long = 3600000L): Dataset[PatternState] = {
    import logs.sparkSession.implicits._
    logs
      .withColumn("pattern_id", Normalize.fingerprint(col("query")))
      .withWatermark("query_start_time", watermark)
      .as[KeyedEvent]
      .groupByKey(_.pattern_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (id: String, rows: Iterator[KeyedEvent], state: GroupState[PatternState]) =>
          if (state.hasTimedOut) {
            val finalState = state.get
            state.remove()
            Iterator.single(finalState)
          } else {
            val prev = state.getOption.getOrElse(emptyState(id))
            val next = updateState(prev,
              rows.map(r => LogEvent(r.query, r.user, r.query_start_time,
                r.query_duration_ms, r.memory_usage)))
            state.update(next)
            state.setTimeoutTimestamp(next.last_seen.getTime + idleGapMs)
            Iterator.empty
          })
  }

  /** Event-time windowed pattern counts with a watermark — the rolling
    * "last N days" analysis (`data_acquisition.py:86-87`) as a live query. */
  def windowedPatternStats(logs: DataFrame, window_ : String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    logs
      .withColumn("pattern_id", Normalize.fingerprint(col("query")))
      .withWatermark("query_start_time", watermark)
      .groupBy(window(col("query_start_time"), window_), col("pattern_id"))
      .agg(
        count(lit(1)).as("frequency"),
        sum("query_duration_ms").as("total_duration_ms"),
        approx_count_distinct("user").as("approx_users"))

  /** Stream-stream equi-join with an event-time interval bound — the
    * live form of the pattern↔context joins (J-family): right-side rows
    * match left-side rows with the same key whose event time falls in
    * `[leftTime - lookBehind, leftTime + lookAhead]`. Both sides carry
    * watermarks, so Spark bounds BOTH state stores: a buffered row is
    * dropped as soon as the other side's watermark passes its join window —
    * this is what lets the join run forever at 100 TB/day, where an
    * unwatermarked stream-stream join would accumulate state without
    * bound. Caller renames columns so the two sides don't collide. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   leftWatermark: String, rightWatermark: String,
                   lookBehind: String, lookAhead: String): DataFrame =
    left.withWatermark(leftTime, leftWatermark)
      .join(right.withWatermark(rightTime, rightWatermark),
        col(leftKey) === col(rightKey) &&
          col(rightTime) >= col(leftTime) - expr(s"INTERVAL $lookBehind") &&
          col(rightTime) <= col(leftTime) + expr(s"INTERVAL $lookAhead"))

  /** Convenience: run a streaming query over `sourceDir` parquet into an
    * in-memory sink and block until the available data is processed
    * (local smoke path; production would point at a real sink). */
  def runOnce(logs: DataFrame, window_ : String, queryName: String): Unit = {
    val q = windowedPatternStats(logs, window_)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
