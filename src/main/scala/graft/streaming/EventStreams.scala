package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine is batch-only (SURVEY.md §2.5); this module is the
  * streaming extension: the same logical transforms as
  * [[graft.ops.TimeOps]], run incrementally with watermarks and state.
  *
  * Scale notes: windowed aggregation state is partitioned by (window, type)
  * — bounded by watermark eviction; session state by user_id with a
  * processing-time timeout. Both scale horizontally with
  * `spark.sql.shuffle.partitions` state stores.
  */
object EventStreams {

  /** Tumbling 1-hour windowed counts/sums per event type with a 2-hour
    * watermark (late data beyond that is dropped, state is evicted).
    * Batch twin: [[graft.ops.TimeOps.hourlyEventAgg]].
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_val"))

  /** Streaming deduplication — the streaming leg of the dedup suite a
    * training-data ingest pipeline needs: exactly-once-per-key emission
    * under at-least-once delivery. `dropDuplicatesWithinWatermark` keys
    * state on the dedup column(s) and — unlike plain `dropDuplicates`,
    * whose key state grows forever on an unbounded stream — evicts each
    * key once the event-time watermark guarantees no more duplicates for
    * it can arrive. State is partitioned by key hash across
    * `spark.sql.shuffle.partitions` stores, the same horizontal-scale
    * story as the windowed aggregates. Batch twin:
    * [[graft.ops.Relational.dedupRows]] / [[graft.ops.Dedup.exactDedup]].
    */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Native session-window aggregation (`session_window`): per-user
    * sessions that close after `gap` of inactivity, aggregated by the
    * engine's built-in merging-window state — the declarative counterpart
    * of [[sessionizeStream]]'s explicit `flatMapGroupsWithState` machine.
    * Prefer this form when per-session AGGREGATES are all that's needed:
    * the state store merges windows internally, the watermark closes and
    * evicts sessions, and the same expression runs identically in batch
    * (the equivalence the spec asserts). Reach for the state machine only
    * when emission must happen mid-session or the state transition isn't
    * expressible as an aggregate.
    */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("n_events"), col("session_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(count: Long, sum: Double, lastTs: Long)

  final case class SessionUpdate(user_id: Long, events_in_session: Long,
      session_value: Double, closed: Boolean)

  /** Custom sessionization state machine via flatMapGroupsWithState:
    * per-user sessions split on a `gapSeconds` inactivity gap — the same
    * rule as the batch twin [[graft.ops.TimeOps.sessionize]] — with the
    * open session closed when the event-time watermark passes
    * `gapSeconds` after its last event. Event-time timeouts (not
    * processing-time) keep the machine deterministic and replayable:
    * reprocessing the same input yields the same sessions regardless of
    * micro-batch boundaries, and the query quiesces when the source
    * drains. flatMap (not map) because one batch can close several
    * sessions for a user (each gap crossing emits a closed session plus
    * the new open one).
    */
  def sessionizeStream(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "2 hours"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, s.count, s.sum, closed = true))
          } else {
            // in-batch events in event-time order; gap > gapSeconds starts
            // a new session (strict >, matching the batch twin)
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ListBuffer.empty[SessionUpdate]
            var cur = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            evs.foreach { e =>
              if (cur.count > 0L && e.ts.getTime - cur.lastTs > gapMs) {
                out += SessionUpdate(userId, cur.count, cur.sum, closed = true)
                cur = SessionState(0L, 0.0, 0L)
              }
              cur = SessionState(
                cur.count + 1L,
                cur.sum + e.value,
                math.max(cur.lastTs, e.ts.getTime))
            }
            state.update(cur)
            // the open session closes when the watermark passes its gap
            state.setTimeoutTimestamp(cur.lastTs + gapMs)
            out += SessionUpdate(userId, cur.count, cur.sum, closed = false)
            out.iterator
          }
      }
  }

  final case class TouchState(channel: String, lastTs: Long, lastId: Long)
  final case class Attribution(user_id: Long, purchase_id: Long, channel: String,
      value: Double)

  /** Streaming last-touch attribution — the incremental twin of
    * [[graft.ops.TimeOps.lastTouchAttribution]]: per-user state carries
    * the most recent touch (click/view); each purchase emits an
    * attribution row against the touch standing at that moment, `'none'`
    * before any touch. State is one tiny record per user (channel +
    * last-touch time), partitioned by user_id across state stores; events
    * inside a micro-batch are processed in (event-time, event_id) order so
    * a batch replay of an in-order stream matches the batch window exactly.
    */
  def attributionStream(
      events: Dataset[Event],
      watermarkDelay: String = "2 hours"): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[TouchState]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption.getOrElse(TouchState("none", Long.MinValue, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[Attribution]
          evs.foreach { e =>
            e.event_type match {
              case "purchase" =>
                out += Attribution(userId, e.event_id, cur.channel, e.value)
              case "click" | "view" =>
                cur = TouchState(e.event_type, e.ts.getTime, e.event_id)
              case _ => () // non-touch, non-purchase events carry no credit
            }
          }
          state.update(cur)
          out.iterator
      }
  }

  final case class PrevState(event_type: String, lastTs: Long, lastId: Long)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming event-transition emission — the incremental twin of
    * [[graft.ops.TimeOps.eventTransitions]]: per-user state carries the
    * previous event type; each event emits its (from → to) pair. The
    * downstream count/probability rollup is an ordinary streaming
    * aggregation over this append stream; state is one record per user.
    */
  def transitionsStream(
      events: Dataset[Event],
      watermarkDelay: String = "2 hours"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PrevState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[PrevState]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var prev = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[Transition]
          evs.foreach { e =>
            prev.foreach(p => out += Transition(userId, p.event_type, e.event_type))
            prev = Some(PrevState(e.event_type, e.ts.getTime, e.event_id))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Stream-stream interval join: each click joined to the same user's
    * views from the preceding `windowSeconds`. Both sides are watermarked
    * so the join state is bounded — Spark buffers only rows young enough
    * to still find a match, evicting by event time. The equi-key
    * (user_id) partitions the state; the time bounds turn an unbounded
    * stream join into a sliding-window join.
    */
  def clickToRecentViews(events: DataFrame, windowSeconds: Long = 1800L): DataFrame = {
    // the watermark must cover the join lookback, or views that are late
    // but still inside the business window get dropped before joining
    val wmDelay = s"${math.max(windowSeconds * 2, 3600L)} seconds"
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", wmDelay)
    val views = events
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("view_user_id"),
        col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", wmDelay)
    clicks.join(
      views,
      col("user_id") === col("view_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowSeconds SECONDS"),
      "inner")
      .select(col("user_id"), col("click_id"), col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Wire a parquet-directory file stream of events through [[hourlyAgg]]
    * into an in-memory table (for tests / local runs). Returns the query;
    * callers stop it.
    */
  def runHourlyAggFromParquetDir(spark: SparkSession, dir: String, queryName: String) = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    hourlyAgg(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
  }
}
