package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

object EventStreamsSpec {
  /** Driver-side sink buffer for the foreachBatch checkpoint test
    * (object-level so the closure serializes cleanly). */
  val CkptBuffer: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)] =
    new java.util.concurrent.ConcurrentLinkedQueue()
}

/** Structured Streaming specs: the incremental paths must agree with their
  * batch twins ([[graft.ops.TimeOps]]) on the same data.
  */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    Event(1L, ts("2024-01-01 00:05:00"), 1L, "click", 2.0),
    Event(2L, ts("2024-01-01 00:45:00"), 1L, "view", 3.0),
    Event(3L, ts("2024-01-01 01:10:00"), 2L, "click", 5.0),
    Event(4L, ts("2024-01-01 01:20:00"), 2L, "click", 7.0),
    Event(5L, ts("2024-01-01 02:59:00"), 1L, "view", 11.0))

  test("streaming DAU: closed days match the batch twin's dau column") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dauStream(input.toDF())
      .writeStream.format("memory").queryName("dau_test")
      .outputMode(OutputMode.Append()).start()
    val all = Seq(
      Event(1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0), // same user/day: 1 dau
      Event(3L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0),
      Event(4L, ts("2024-01-02 10:00:00"), 3L, "view", 1.0),  // advances wm past day 1
      Event(5L, ts("2024-01-03 10:00:00"), 9L, "view", 1.0))  // sentinel closes day 2
    try {
      input.addData(all.take(3))
      query.processAllAvailable()
      input.addData(all.drop(3))
      query.processAllAvailable()
      input.addData(Seq(all.last)) // re-deliver sentinel: watermark advances, no new rows
      query.processAllAvailable()
      val streamed = spark.sql("SELECT day, dau FROM dau_test")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val batch = graft.ops.TimeOps.activeUsers(all.toDF())
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      // days 1 and 2 are closed by the watermark; day 3 is still open
      assert(streamed.keySet == Set("2024-01-01", "2024-01-02"), s"got $streamed")
      streamed.foreach { case (d, n) =>
        assert(batch(d) == n, s"day $d: streaming $n != batch ${batch(d)}")
      }
    } finally query.stop()
  }

  test("streaming DAU dedups same-day activity farther apart than the watermark delay") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 2h delay << the 22h gap between user 1's two same-day events: a
    // bare watermark-delay dedup evicts (user 1, day 1) long before the
    // second event arrives and overcounts day 1 as 3 — the window-keyed
    // chained aggregation must still report 2
    val query = EventStreams.dauStream(input.toDF(), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("dau_gap_test")
      .outputMode(OutputMode.Append()).start()
    val all = Seq(
      Event(1L, ts("2024-01-01 01:00:00"), 1L, "view", 1.0),
      Event(2L, ts("2024-01-01 23:30:00"), 2L, "view", 1.0), // wm → 21:30
      Event(3L, ts("2024-01-01 23:00:00"), 1L, "click", 1.0), // same user/day, not late
      Event(4L, ts("2024-01-02 10:00:00"), 3L, "view", 1.0), // closes day 1
      Event(5L, ts("2024-01-03 10:00:00"), 9L, "view", 1.0)) // closes day 2
    try {
      all.foreach { e =>
        input.addData(Seq(e)); query.processAllAvailable()
      }
      input.addData(Seq(all.last)) // re-deliver sentinel to drain chained emission
      query.processAllAvailable()
      val streamed = spark.sql("SELECT day, dau FROM dau_gap_test")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val batch = graft.ops.TimeOps.activeUsers(all.toDF())
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(streamed.get("2024-01-01").contains(2L),
        s"day 1 must count user 1 once despite the 22h gap: $streamed")
      streamed.foreach { case (d, n) =>
        assert(batch(d) == n, s"day $d: streaming $n != batch ${batch(d)}")
      }
    } finally query.stop()
  }

  test("streaming dedup emits each key once across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dedupStream(input.toDF())
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // duplicate event_ids arrive both within one batch and re-delivered
      // in a later batch (the at-least-once redelivery case)
      input.addData(Seq(
        events(0), events(0), events(1), events(2)))
      query.processAllAvailable()
      input.addData(Seq(
        events(1), events(2), events(3), events(4)))
      query.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_test")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // each exactly once
    } finally query.stop()
  }

  test("native session_window agg: streaming equals batch on the same events") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionWindowAgg(input.toDF())
      .writeStream
      .format("memory")
      .queryName("swin_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // advance the watermark far enough to close every session
      input.addData(Seq(Event(99L, ts("2024-01-01 12:00:00"), 9L, "view", 0.0)))
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, session_start, n_events, session_value FROM swin_test")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .filter(_._1 != 9L).toSet
      val batch = EventStreams.sessionWindowAgg(events.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch,
        s"streaming sessions must equal the batch run:\n s=$streamed\n b=$batch")
      // sanity: user 2's two clicks 10 min apart form ONE session of value 12
      assert(batch.exists { case (u, _, n, v) => u == 2L && n == 2L && v == 12.0 })
    } finally query.stop()
  }

  test("streaming hourlyAgg matches the batch twin on the same events") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyAgg(input.toDF())
      .writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT window_start, event_type, cnt, sum_val FROM hourly_test")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = graft.ops.TimeOps.hourlyEventAgg(events.toDF())
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // batch renders ISO text; streamed gives timestamps — normalize
      def isoToSqlTs(iso: String): String =
        Timestamp.from(java.time.Instant.parse(iso)).toString
      assert(streamed == batch.map { case (h, t, c, v) => (isoToSqlTs(h), t, c, v) })
      assert(streamed.size == 4) // (00h click),(00h view),(01h click),(02h view)
    } finally query.stop()
  }

  test("streaming sessionization accumulates state and closes on watermark") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 0-second watermark delay: watermark = max event time of previous
    // batches, so event-time timeouts fire deterministically per batch
    val query = EventStreams.sessionizeStream(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(events.take(2)) // user 1 @ 00:05, 00:45
      query.processAllAvailable()
      input.addData(events.drop(2)) // user 2 @ 01:10, 01:20; user 1 @ 02:59
      query.processAllAvailable()
      // watermark is now 02:59; user 2's timeout (01:20 + 30min = 01:50)
      // fires on the next batch
      input.addData(Seq(Event(99L, ts("2024-01-01 09:00:00"), 3L, "view", 1.0)))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, events_in_session, session_value, closed FROM session_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      // user 1's gaps (40 min, 2h14m) both exceed the 30-min session gap,
      // so each event is its own session — same as the batch twin
      assert(rows.contains((1L, 1L, 2.0, true)))  // split within batch 1
      assert(rows.contains((1L, 1L, 3.0, true)))  // split by batch 2's event
      assert(rows.contains((1L, 1L, 11.0, true))) // closed by the watermark
      assert(!rows.exists { case (u, n, _, _) => u == 1L && n > 1L })
      // user 2's events are 10 min apart: one session, closed by watermark
      assert(rows.contains((2L, 2L, 12.0, true)))
      // user 3's session (09:00, timeout 09:30) stays open
      assert(!rows.exists { case (u, _, _, c) => u == 3L && c })
    } finally query.stop()
  }

  test("stream-stream interval join pairs clicks with recent views only") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val joined = EventStreams.clickToRecentViews(input.toDF(), windowSeconds = 1800L)
    val query = joined.writeStream
      .format("memory")
      .queryName("ssj_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(Seq(
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0),   // in window
        Event(2L, ts("2024-01-01 10:20:00"), 7L, "view", 1.0),   // in window
        Event(3L, ts("2024-01-01 09:00:00"), 7L, "view", 1.0),   // too old
        Event(4L, ts("2024-01-01 10:25:00"), 8L, "view", 1.0),   // other user
        Event(5L, ts("2024-01-01 10:30:00"), 7L, "click", 1.0)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM ssj_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((5L, 1L), (5L, 2L)))
    } finally query.stop()
  }

  test("stateful query resumes from checkpoint without losing session state") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = SparkTestBase.tempDir("graft_ckpt").toString
    val input = MemoryStream[Event]
    // the memory sink can't recover from a checkpoint; foreachBatch can —
    // collect each micro-batch's updates into a driver-side buffer
    val seen = EventStreamsSpec.CkptBuffer

    def start() = EventStreams
      .sessionizeStream(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.SessionUpdate], _: Long) =>
        batch.collect().foreach(u =>
          seen.add((u.user_id, u.events_in_session, u.session_value)))
      }
      .start()

    seen.clear()
    val q1 = start()
    try {
      input.addData(Seq(
        Event(1L, ts("2024-01-01 10:00:00"), 5L, "click", 2.0),
        Event(2L, ts("2024-01-01 10:10:00"), 5L, "click", 3.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.contains((5L, 2L, 5.0)), s"pre-restart updates missing: $seen")

    // restart from the same checkpoint: the open session (2 events, 5.0)
    // must still be in state, so the next in-gap event extends it to 3
    val q2 = start()
    try {
      input.addData(Seq(Event(3L, ts("2024-01-01 10:20:00"), 5L, "click", 7.0)))
      q2.processAllAvailable()
      assert(seen.contains((5L, 3L, 12.0)),
        s"state lost across restart: $seen")
    } finally q2.stop()
  }

  /** The full events parquet read as [[Event]]s, through the same
    * schema-dispatching loader the batch queries use ([[SparkEntry.loadEvents]]). */
  private def parquetEvents(): Seq[Event] = {
    import org.apache.spark.sql.functions.col
    val sparkS = spark
    import sparkS.implicits._
    SparkEntry.loadEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
  }

  test("streaming hourlyAgg drains the full events parquet to the batch answer") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two micro-batches split at the event-time median: groups straddling
    // the split are updated in BOTH batches, so this exercises incremental
    // state revision, watermark advance, and Update-mode re-emission — not
    // just a single-batch replay of the batch plan
    val all = parquetEvents().sortBy(_.ts.getTime)
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("hourly_full_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      // Update mode emits a group once per batch it changed in; a group's
      // count only grows, so its final state is its max-cnt emission
      val streamed = spark.sql(
        "SELECT window_start, event_type, cnt, sum_val FROM hourly_full_test")
        .collect()
        .map(r => ((r.getTimestamp(0).toInstant.toString, r.getString(1)), (r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).maxBy(_._1)) }
      val batch = graft.ops.TimeOps.hourlyEventAgg(all.toDF())
        .collect()
        .map(r => ((java.time.Instant.parse(r.getString(0)).toString, r.getString(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
      assert(streamed.size == batch.size,
        s"group count: streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streaming dedup under full-table redelivery equals batch dropDuplicates") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = parquetEvents()
    val input = MemoryStream[Event]
    val query = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_full_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // at-least-once delivery: the source redelivers the ENTIRE table in a
      // second batch; every redelivered row is either still keyed in the
      // dedup state or already below the watermark — emitted exactly once
      input.addData(all); query.processAllAvailable()
      input.addData(all); query.processAllAvailable()
      val streamedIds = spark.sql("SELECT event_id FROM dedup_full_test")
        .collect().map(_.getLong(0)).sorted.toSeq
      val batchIds = (all ++ all).toDF().dropDuplicates("event_id")
        .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(streamedIds == batchIds)
      assert(streamedIds.distinct.size == streamedIds.size, "a key was emitted twice")
    } finally query.stop()
  }

  test("watermark evicts state: late data beyond 2h is dropped") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyAgg(input.toDF())
      .writeStream
      .format("memory")
      .queryName("wm_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // advance the watermark decisively: 09:00 - 2h = 07:00, far past
      // every window above → those windows finalize and emit
      input.addData(Seq(Event(100L, ts("2024-01-01 09:00:00"), 3L, "view", 1.0)))
      query.processAllAvailable()
      // this event's window ([00:00,01:00), end 01:00 ≤ watermark 07:00)
      // is already finalized → the row must be dropped, not re-aggregated
      input.addData(Seq(Event(99L, ts("2024-01-01 00:05:30"), 3L, "click", 100.0)))
      query.processAllAvailable()
      val closed = spark.sql("SELECT window_start, event_type, cnt FROM wm_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      // the 00h click window finalized with exactly the one on-time event
      assert(closed.contains(("2024-01-01 00:00:00.0", "click", 1L)))
      assert(!closed.exists { case (w, t, c) => w.startsWith("2024-01-01 00:") && t == "click" && c > 1 })
    } finally query.stop()
  }

  test("streaming transitions match the batch Markov counts across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val trEvents = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0),
      Event(3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 0.0),
      Event(4L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0),
      Event(5L, ts("2024-01-01 09:30:00"), 2L, "view", 0.0))
    val input = MemoryStream[Event]
    val query = EventStreams.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("tr_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // the cross-batch boundary cuts user 1's chain: state must bridge it
      input.addData(trEvents.take(2))
      query.processAllAvailable()
      input.addData(trEvents.drop(2))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT from_type, to_type FROM tr_test")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.ops.TimeOps.eventTransitions(trEvents.toDF())
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed == Set(("view", "click", 1L), ("click", "purchase", 1L),
        ("view", "view", 1L)))
    } finally query.stop()
  }

  test("streaming last-touch attribution matches the batch twin across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val attrEvents = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      Event(2L, ts("2024-01-01 11:00:00"), 1L, "purchase", 10.0), // ← click
      Event(3L, ts("2024-01-01 12:00:00"), 1L, "view", 0.0),
      Event(4L, ts("2024-01-01 12:30:00"), 1L, "error", 0.0), // must not steal credit
      Event(5L, ts("2024-01-01 13:00:00"), 1L, "purchase", 20.0), // ← view
      Event(6L, ts("2024-01-01 09:00:00"), 2L, "purchase", 5.0)) // ← none
    val input = MemoryStream[Event]
    val query = EventStreams.attributionStream(input.toDS())
      .writeStream
      .format("memory")
      .queryName("attr_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // split across micro-batches so state genuinely carries the touch
      input.addData(attrEvents.take(3))
      query.processAllAvailable()
      input.addData(attrEvents.drop(3))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT purchase_id, channel, value FROM attr_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(streamed == Set((2L, "click", 10.0), (5L, "view", 20.0), (6L, "none", 5.0)))
      // aggregate equivalence with the batch window twin
      val batch = graft.ops.TimeOps.lastTouchAttribution(attrEvents.toDF())
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val streamedAgg = streamed.groupBy(_._2).map { case (ch, rows) =>
        (ch, rows.size.toLong, rows.map(_._3).sum)
      }.toSet
      assert(streamedAgg == batch)
    } finally query.stop()
  }

  test("streaming funnel matches the batch stage vectors across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = parquetEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_full_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      // stage flags are monotone, so the final vector per user is the OR
      // over the re-emitted Update rows
      val streamed = spark.sql(
        """SELECT user_id, max(reached_view), max(reached_click), max(reached_purchase)
          |FROM funnel_full_test GROUP BY user_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
        .toSet
      val batch = graft.ops.TimeOps.funnelStages(all.toDF())
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
        .toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streaming retention touches aggregate to the batch cohort triangle") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = parquetEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.retentionStream(input.toDS())
      .writeStream.format("memory").queryName("retention_full_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val streamed = spark.sql(
        """SELECT cohort_day, day_offset, count(*) FROM retention_full_test
          |GROUP BY cohort_day, day_offset""".stripMargin)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
      val batch = graft.ops.TimeOps.retentionCohorts(all.toDF())
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("attribution ignores a cross-batch late touch: credit stays with the newest touch") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attr_late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: view at 12:00 establishes the standing touch
      input.addData(Seq(Event(1L, ts("2024-01-01 12:00:00"), 1L, "view", 0.0)))
      query.processAllAvailable()
      // batch 2: a LATE click (10:00 < carried 12:00) then a purchase —
      // the purchase must credit the 12:00 view, exactly what the batch
      // twin computes over the full in-order event set
      input.addData(Seq(
        Event(2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
        Event(3L, ts("2024-01-01 13:00:00"), 1L, "purchase", 10.0)))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT purchase_id, channel FROM attr_late_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == Set((3L, "view")))
      val batch = graft.ops.TimeOps.lastTouchAttribution(Seq(
        Event(1L, ts("2024-01-01 12:00:00"), 1L, "view", 0.0),
        Event(2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
        Event(3L, ts("2024-01-01 13:00:00"), 1L, "purchase", 10.0)).toDF())
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(batch == Map("view" -> 1L))
    } finally query.stop()
  }

  test("transitions drop a cross-batch late event instead of regressing state") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("trans_late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(
        Event(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        Event(2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0)))
      query.processAllAvailable()
      // late signup (10:30) arrives after state already carries the 11:00
      // click; then an in-order purchase. The late event must emit nothing
      // and NOT regress state: the suffix transition is click→purchase
      // (state regression would emit signup→purchase — a pair the batch
      // twin never produces for this history's suffix)
      input.addData(Seq(
        Event(3L, ts("2024-01-01 10:30:00"), 1L, "signup", 0.0),
        Event(4L, ts("2024-01-01 12:00:00"), 1L, "purchase", 5.0)))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT from_type, to_type FROM trans_late_test")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(streamed == Seq(("click", "purchase"), ("view", "click")))
    } finally query.stop()
  }

  test("streaming as-of: ties, tolerance, and pre-view clicks") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.asofStream(
        input.toDF().as[Event], toleranceMicros = Some(45L * 60 * 1000000))
      .writeStream.format("memory").queryName("asof_small_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(
        Event(1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0), // before any view
        Event(3L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),  // same-instant tie:
        Event(2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0), //   view wins (rt <= t)
        Event(4L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),  //   and max id stands
        Event(5L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0), // in tolerance (30m)
        Event(6L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0)))// OUT of tolerance (60m)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT click_id, view_id FROM asof_small_test")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      assert(streamed == Map(
        1L -> None, 2L -> Some(4L), 5L -> Some(4L), 6L -> None))
    } finally query.stop()
  }

  test("streaming as-of drains the full events parquet to the native batch answer") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    // in-(event-time)-order delivery split into two micro-batches: per-user
    // view state must bridge the batch boundary for clicks in batch 2 whose
    // matching view arrived in batch 1
    val all = parquetEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.asofStream(input.toDF().as[Event])
      .writeStream.format("memory").queryName("asof_full_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, click_id, view_id FROM asof_full_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
        .sortBy(t => (t._1, t._2))
      val batch = graft.ops.TimeOps.asofJoinNative(
          SparkEntry.loadEvents(spark, "/root/testdata/sf0.001/events.parquet"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
        .sortBy(t => (t._1, t._2))
      assert(streamed.length == batch.length,
        s"row count: streamed ${streamed.length} vs batch ${batch.length}")
      assert(streamed.toSeq == batch.toSeq)
    } finally query.stop()
  }
}
