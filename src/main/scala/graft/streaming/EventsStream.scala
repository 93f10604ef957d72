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

  /** Stream-static AS-OF attribution — the streaming twin of
    * `RelationalQueries.asofJoinBackward` (q106): each arriving event
    * picks the `valCol` of the latest at-or-before row of a STATIC keyed
    * timeline (purchases, model-version rollouts, price books).
    *
    * The batch form's union + keyed window cannot run on a stream
    * (a window over event time would buffer unboundedly), so the
    * timeline is pre-aggregated ONCE into a sorted (ts, val) array per
    * key and joined stream-static — broadcast when dimension-sized — and
    * per event the lookup is a map-only array probe: no streaming state,
    * no shuffle per trigger beyond the join, and late events attribute
    * correctly by construction since the whole timeline is present.
    * Ties at equal ts resolve to the GREATEST value via the struct sort,
    * matching the batch operator's documented tie rule (null values sort
    * first, so a null-valued tie row loses to any non-null one; a SOLE
    * latest row with a null value yields null, like the ASOF oracle).
    * Works unchanged on a batch DataFrame (the equivalence test runs it
    * both ways).
    *
    * `broadcastTimeline`: `None` (default) leaves the join unhinted so
    * AQE sizes it from runtime stats — a dimension-sized packed timeline
    * still becomes a broadcast join, a corpus-scale one stays a keyed
    * shuffle join. `Some(true)` forces the broadcast (zero shuffle per
    * micro-batch — only when the caller KNOWS the timeline is small);
    * `Some(false)` forces the keyed shuffle join (sort-merge), the
    * scale-safe shape for a timeline that grows with the corpus.
    *
    * Packing puts one array per key — a power-law hot key's ENTIRE
    * timeline lands in a single row. Fine for price books and rollout
    * schedules; for a timeline where one key can hold millions of rows,
    * use [[graft.operators.RelationalQueries.asofJoinBackward]], whose
    * per-key work is a streaming window, not a materialized array.
    */
  def attributeStream(events: DataFrame, timeline: DataFrame,
                      keyCol: String, tsCol: String, valCol: String,
                      outCol: String,
                      broadcastTimeline: Option[Boolean] = None): DataFrame = {
    val packed = timeline
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(tsCol).as("_t"),
        col(valCol).as("_v")))).as("_tl"))
    val right = broadcastTimeline match {
      case Some(true)  => broadcast(packed)
      case Some(false) => packed.hint("merge")
      case None        => packed
    }
    events.join(right, Seq(keyCol), "left")
      .withColumn(outCol,
        try_element_at(
          filter(col("_tl"), p => p.getField("_t") <= col(tsCol)),
          lit(-1)).getField("_v"))
      .drop("_tl")
  }

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
