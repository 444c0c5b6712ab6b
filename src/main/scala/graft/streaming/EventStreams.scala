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

  /** Streaming DAU: exact distinct users per CLOSED event-time day — the
    * streaming leg of [[graft.ops.TimeOps.activeUsers]]'s dau column (the
    * 7-day WAU union stays a batch rollup over the emitted days). This is
    * the CHAINED streaming-aggregation shape: a per-(1-day window, user)
    * aggregate collapses each user's activity to one row per day, and a
    * second aggregate over the re-derived day window counts those rows.
    * Keying the dedup state on the WINDOW (not a bare watermark-delay
    * dedup à la `dropDuplicatesWithinWatermark`) is load-bearing: the
    * (day, user) state lives until the watermark closes the DAY, so a
    * user active at 01:00 and again at 23:00 still counts once even when
    * the watermark delay is far shorter than a day. Both state stores are
    * evicted by the same event-time watermark; per-day memory is bounded
    * by distinct users, never events. Append mode emits each day exactly
    * once, when the watermark closes it.
    */
  def dauStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(window(window_time(col("w")), "1 day").as("w2"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w2.start").cast("date").as("day"), col("dau"))

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
    *
    * Out-of-order guard ACROSS micro-batches: a touch that arrives late —
    * in a later batch but with an earlier (ts, event_id) than the carried
    * touch — must NOT overwrite the standing (newer) touch, or every
    * subsequent purchase would be credited to a channel the batch twin
    * says was already superseded. The state's (lastTs, lastId) exists for
    * exactly this comparison.
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
              case "click" | "view"
                  if e.ts.getTime > cur.lastTs ||
                    (e.ts.getTime == cur.lastTs && e.event_id > cur.lastId) =>
                cur = TouchState(e.event_type, e.ts.getTime, e.event_id)
              case "click" | "view" => () // late arrival: keep the newer touch
              case _ => () // non-touch, non-purchase events carry no credit
            }
          }
          state.update(cur)
          out.iterator
      }
  }

  final case class ViewState(viewId: Long, viewTs: Long, any: Boolean)
  final case class AsOfMatch(user_id: Long, click_id: Long, view_id: Option[Long])

  /** Streaming as-of enrichment — the ingest-time twin of the native batch
    * operator ([[graft.plans.AsOfJoin]], registered as `q_asof_native` /
    * `q_asof_tolerance` via [[graft.ops.TimeOps.asofJoinNative]]): per-user
    * state carries the most recent view; each click emits its as-of match
    * (the standing view's id, or null before any view / when the standing
    * view is older than `toleranceMicros`). Same O(1)-per-key state bound
    * as the batch operator's per-task cursor, partitioned by user_id
    * across state stores.
    *
    * Out-of-order guard ACROSS micro-batches, same contract as
    * [[attributionStream]]: a view arriving late (earlier (ts, id) than
    * the carried one) must not regress the state; a click is matched
    * against whatever view was standing when it is processed — if its true
    * match arrives even later, Append mode cannot retract the emitted row,
    * which is the documented divergence window (bounded by the watermark
    * delay) of any streaming as-of.
    */
  def asofStream(
      events: Dataset[Event],
      toleranceMicros: Option[Long] = None,
      watermarkDelay: String = "2 hours"): Dataset[AsOfMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ViewState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ViewState]) =>
          // views sort BEFORE clicks at an equal timestamp: the batch
          // operator's match condition is rt <= t, so a same-instant view
          // is eligible no matter how the ids compare
          val evs = batch.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.event_type == "view") 0 else 1, e.event_id))
          var cur = state.getOption.getOrElse(ViewState(0L, Long.MinValue, any = false))
          val out = scala.collection.mutable.ListBuffer.empty[AsOfMatch]
          evs.foreach { e =>
            e.event_type match {
              case "click" =>
                // ts is millis here; tolerance is micros to mirror the
                // batch operator's signature
                val inTol = toleranceMicros.forall(t =>
                  (e.ts.getTime - cur.viewTs) * 1000L <= t)
                out += AsOfMatch(userId, e.event_id,
                  if (cur.any && inTol) Some(cur.viewId) else None)
              case "view"
                  if e.ts.getTime > cur.viewTs ||
                    (e.ts.getTime == cur.viewTs && (!cur.any || e.event_id > cur.viewId)) =>
                cur = ViewState(e.event_id, e.ts.getTime, any = true)
              case _ => () // late view (keep the newer one) or other types
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
    *
    * Out-of-order guard ACROSS micro-batches: an event older than the
    * carried (lastTs, lastId) is DROPPED — it can neither emit (its true
    * predecessor is unrecoverable in Append mode) nor regress the state
    * (which would corrupt every subsequent transition). The stream's
    * suffix after a late arrival therefore still matches the batch twin.
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
            val late = prev.exists(p =>
              e.ts.getTime < p.lastTs ||
                (e.ts.getTime == p.lastTs && e.event_id < p.lastId))
            if (!late) {
              prev.foreach(p => out += Transition(userId, p.event_type, e.event_type))
              prev = Some(PrevState(e.event_type, e.ts.getTime, e.event_id))
            }
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  final case class FunnelState(tView: Long, tClick: Long, tBuy: Long, lastTs: Long, lastId: Long)
  final case class FunnelUpdate(user_id: Long, reached_view: Boolean,
      reached_click: Boolean, reached_purchase: Boolean)

  /** Streaming ordered funnel — the incremental twin of
    * [[graft.ops.TimeOps.funnelStages]]: per-user state carries the three
    * stage timestamps (first view, first click strictly after it, first
    * purchase strictly after that); each batch re-emits the user's stage
    * vector in Update mode. State is three longs per user regardless of
    * event volume — the same user-cardinality bound as the batch shape's
    * per-stage aggregates. Events are applied in (ts, event_id) order with
    * the standard cross-batch monotonicity guard: an event older than the
    * carried (lastTs, lastId) is dropped rather than allowed to rewrite a
    * stage the batch twin says was reached earlier.
    */
  def funnelStream(events: Dataset[Event],
      watermarkDelay: String = "2 hours"): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val Unset = Long.MinValue
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(
            FunnelState(Unset, Unset, Unset, Long.MinValue, Long.MinValue))
          evs.foreach { e =>
            val t = e.ts.getTime
            val late = t < s.lastTs || (t == s.lastTs && e.event_id < s.lastId)
            if (!late) {
              e.event_type match {
                case "view" if s.tView == Unset =>
                  s = s.copy(tView = t)
                case "click" if s.tClick == Unset && s.tView != Unset && t > s.tView =>
                  s = s.copy(tClick = t)
                case "purchase" if s.tBuy == Unset && s.tClick != Unset && t > s.tClick =>
                  s = s.copy(tBuy = t)
                case _ => ()
              }
              s = s.copy(lastTs = t, lastId = e.event_id)
            }
          }
          state.update(s)
          FunnelUpdate(userId, s.tView != Unset, s.tClick != Unset, s.tBuy != Unset)
      }
  }

  final case class RetentionState(cohortEpochDay: Long, seenEpochDays: List[Long])
  final case class RetentionTouch(user_id: Long, cohort_day: java.sql.Date,
      day_offset: Long)

  /** Streaming retention-cohort touches — the incremental twin of
    * [[graft.ops.TimeOps.retentionCohorts]]: per-user state carries the
    * cohort day (first-ever activity day) and the set of days already
    * emitted; the FIRST event of each (user, day) appends one touch row
    * with its offset from the cohort day. The daily retention triangle is
    * then an ordinary streaming count over this append stream — same
    * split as [[transitionsStream]] and its rollup. State per user is the
    * day set, bounded by the retention horizon (days, not events); a
    * production deployment caps it by dropping offsets beyond the
    * triangle's width. In-order contract: the first-ever event fixes the
    * cohort day (the same cross-batch monotonicity stance as the other
    * machines — a late earlier-day event cannot re-cohort a user, which
    * would require retracting emitted offsets).
    */
  def retentionStream(events: Dataset[Event],
      watermarkDelay: String = "2 hours"): Dataset[RetentionTouch] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Day boundaries must match the batch twin's to_date(ts), which cuts
    // in the SESSION timezone — resolve it on the driver and close over
    // it, rather than floorDiv on epoch millis (UTC boundaries), so the
    // two twins agree under any session zone, not just the UTC this
    // project pins in build.sbt.
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionTouch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[RetentionState]) =>
          def epochDay(e: Event): Long =
            e.ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            var s = state.getOption.getOrElse(
              RetentionState(epochDay(evs.head), Nil))
            val out = scala.collection.mutable.ListBuffer.empty[RetentionTouch]
            evs.foreach { e =>
              val d = epochDay(e)
              if (d >= s.cohortEpochDay && !s.seenEpochDays.contains(d)) {
                s = s.copy(seenEpochDays = d :: s.seenEpochDays)
                out += RetentionTouch(userId,
                  java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.cohortEpochDay)),
                  d - s.cohortEpochDay)
              }
            }
            state.update(s)
            out.iterator
          }
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
