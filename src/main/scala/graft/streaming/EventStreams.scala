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

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(count: Long, sum: Double, lastTs: Long)

  final case class SessionUpdate(user_id: Long, events_in_session: Long,
      session_value: Double, closed: Boolean)

  /** Custom sessionization state machine via mapGroupsWithState: per-user
    * running session, closed when the event-time watermark passes
    * `gapSeconds` after the session's last event. Event-time timeouts
    * (not processing-time) keep the state machine deterministic and
    * replayable — reprocessing the same input produces the same sessions,
    * and the query quiesces when the source drains (a processing-time
    * timeout keeps scheduling wall-clock batches forever).
    */
  def sessionizeStream(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "2 hours"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.count, s.sum, closed = true)
          } else {
            val evs = batch.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val next = SessionState(
              prev.count + evs.size,
              prev.sum + evs.map(_.value).sum,
              math.max(prev.lastTs, evs.map(_.ts.getTime).maxOption.getOrElse(0L)))
            state.update(next)
            // session closes when the watermark passes last event + gap
            state.setTimeoutTimestamp(next.lastTs + gapSeconds * 1000L)
            SessionUpdate(userId, next.count, next.sum, closed = false)
          }
      }
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
