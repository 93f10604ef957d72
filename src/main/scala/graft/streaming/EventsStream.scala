package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` schema
  * (ts, event_type, value). The reference is strictly batch (SURVEY.md
  * §2.8) — these are the streaming-native forms of its aggregations,
  * built on watermarks + windowed aggregation and keyed state.
  *
  * Scale notes: windowed aggregation shuffles once per trigger on
  * (window, event_type); the watermark bounds state size — without it a
  * 100 TB/day stream accumulates state forever. Sessionization keeps one
  * state row per active key; timeouts evict.
  */
object EventsStream {

  /** Hourly tumbling-window counts/sums with a watermark: late events
    * beyond `lateness` are dropped and their windows finalized. Works on
    * both streaming and batch DataFrames (same plan — the batch run of
    * this function is q13's shape).
    */
  def hourlyStats(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Event(ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessionState(count: Long, lastTs: Long)
  case class Session(event_type: String, n_events: Long, closedAtMs: Long)

  /** Gap-based sessionization via keyed state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): a session per
    * event_type closes after `gapMs` of event-time silence. EVENT-time
    * timeouts keyed to the watermark — deterministic under replay (a
    * processing-time timeout would couple session boundaries to wall
    * clock), and the watermark bounds state size at scale.
    *
    * Callers must `withWatermark("ts", …)` on the input before the typed
    * conversion.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 60000): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, s.count, s.lastTs))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val next = SessionState(prev.count + batch.size,
              math.max(prev.lastTs, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + gapMs)
            Iterator.empty
          }
      }
  }
}
