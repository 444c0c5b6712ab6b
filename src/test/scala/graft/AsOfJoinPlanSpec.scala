package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, AsOfJoinExec, AsOfJoinNode, BroadcastAsOfJoinExec}

/** The native as-of join: semantics on hand-built frames, equivalence with
  * the window-composition form on real events data, and plan shape (the
  * custom exec node is actually planned, shuffle count, filter pushdown
  * through the custom node).
  */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def probe() = Seq(
    (1L, ts("2024-01-01 10:00:00"), "p1"),
    (1L, ts("2024-01-01 12:00:00"), "p2"),
    (2L, ts("2024-01-01 09:00:00"), "p3"),
    (3L, ts("2024-01-01 11:00:00"), "p4")
  ).toDF("k", "t", "p_id")

  private def ref() = Seq(
    (1L, ts("2024-01-01 09:30:00"), "r1"),
    (1L, ts("2024-01-01 11:00:00"), "r2"),
    (2L, ts("2024-01-01 09:30:00"), "r3"), // after the only k=2 probe
    (4L, ts("2024-01-01 00:00:00"), "r4")  // key with no probe rows
  ).toDF("k", "t", "r_id")

  test("matches the most recent at-or-before row per key, null when none") {
    for (bcast <- Seq(Some(false), Some(true))) {
      val got = AsOfJoin.leftAsOf(
          probe(),
          ref().select(col("k"), col("t").as("rt"), col("r_id")),
          on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
          broadcastRight = bcast)
      val rows = got.select("p_id", "r_id").as[(String, Option[String])]
        .collect().toMap
      assert(rows == Map(
        "p1" -> Some("r1"), // 10:00 → 09:30
        "p2" -> Some("r2"), // 12:00 → 11:00
        "p3" -> None,       // only k=2 ref row is later
        "p4" -> None),      // no k=3 ref rows at all
        s"variant broadcast=$bcast")
    }
  }

  test("on `Seq(\"k\")` with shared column names, self-lineage dedups") {
    // both sides derive from the SAME frame: exercises the re-alias path
    val base = probe()
    val out = AsOfJoin.leftAsOf(
      base.filter(col("p_id") =!= "p2"), base,
      on = Seq("k"), leftTimeCol = "t", rightTimeCol = "t",
      rightTieBreak = Some("p_id"))
    assert(out.count() == 3)
  }

  test("tie on time is broken by the greatest tiebreak column") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "q")).toDF("k", "t", "q_id")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("rk", "rt", "r_id")
    val out = AsOfJoin.leftAsOf(l, r.withColumnRenamed("rk", "k"),
      on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
      rightTieBreak = Some("r_id"))
    assert(out.select("r_id").as[String].head() == "b")
  }

  test("tolerance turns too-old matches into nulls") {
    for (bcast <- Seq(Some(false), Some(true))) {
      val out = AsOfJoin.leftAsOf(
        probe(),
        ref().select(col("k"), col("t").as("rt"), col("r_id")),
        on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
        toleranceMicros = Some(45L * 60 * 1000000), // 45 min
        broadcastRight = bcast)
      val rows = out.select("p_id", "r_id").as[(String, Option[String])]
        .collect().toMap
      // p1 at 10:00 matched r1 at 09:30 (30 min — in tolerance);
      // p2 at 12:00 matched r2 at 11:00 (60 min — OUT of tolerance).
      assert(rows("p1") == Some("r1") && rows("p2") == None, s"broadcast=$bcast")
    }
  }

  test("empty right side yields all-null matches, not an error") {
    for (bcast <- Seq(Some(false), Some(true))) {
      val out = AsOfJoin.leftAsOf(
        probe(),
        ref().filter(lit(false)).select(col("k"), col("t").as("rt"), col("r_id")),
        on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
        broadcastRight = bcast)
      assert(out.count() == 4 && out.filter(col("r_id").isNotNull).count() == 0,
        s"broadcast=$bcast")
    }
  }

  test("matches the window-composition as-of on real events data") {
    val events = SparkEntry.loadEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val expected = graft.ops.TimeOps.asofJoinClickToView(events)
      .select("user_id", "click_id", "last_view_id")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val got = AsOfJoin.leftAsOf(
        clicks, views.withColumnRenamed("v_user", "user_id"),
        on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "v_ts",
        rightTieBreak = Some("view_id"))
      .select(col("user_id"), col("click_id"), col("view_id").as("last_view_id"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("plan: sorted-merge variant is planned with exactly two shuffles") {
    val out = AsOfJoin.leftAsOf(
      probe(),
      ref().select(col("k"), col("t").as("rt"), col("r_id")),
      on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
      broadcastRight = Some(false))
    out.count() // finalize AQE
    val executed = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(executed.exists(_.isInstanceOf[AsOfJoinExec]),
      s"expected AsOfJoinExec in:\n$executed")
    val shuffles = executed.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 2, s"expected 2 shuffles, got ${shuffles.size}:\n$executed")
  }

  test("plan: broadcast variant never shuffles the probe side") {
    val out = AsOfJoin.leftAsOf(
      probe(),
      ref().select(col("k"), col("t").as("rt"), col("r_id")),
      on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
      broadcastRight = Some(true))
    out.count() // finalize AQE
    val executed = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(executed.exists(_.isInstanceOf[BroadcastAsOfJoinExec]),
      s"expected BroadcastAsOfJoinExec in:\n$executed")
    val shuffles = executed.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty, s"expected 0 shuffles, got ${shuffles.size}:\n$executed")
    assert(executed.toString.contains("BroadcastExchange"),
      s"right side should arrive via a broadcast exchange:\n$executed")
  }

  test("null keys and null times never match, in either physical variant") {
    // SQL equi-join semantics: null keys don't match (not even null=null),
    // and a null timestamp can't satisfy rt <= lt
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None: Option[Long], Some(ts("2024-01-01 10:00:00")), "null_key"),
      (Some(1L), None: Option[java.sql.Timestamp], "null_time")
    ).toDF("k", "t", "p_id")
    val r = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), "r_ok"),
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), "r_null_key"),
      (Some(1L), None: Option[java.sql.Timestamp], "r_null_time")
    ).toDF("k", "rt", "r_id")
    for (bcast <- Seq(Some(false), Some(true))) {
      val rows = AsOfJoin.leftAsOf(l, r,
          on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt",
          broadcastRight = bcast)
        .select("p_id", "r_id").as[(String, Option[String])].collect().toMap
      assert(rows == Map(
        "ok" -> Some("r_ok"),   // the only legal match
        "null_key" -> None,     // null left key
        "null_time" -> None),   // null left time
        s"broadcast=$bcast")
    }
  }

  test("randomized: native as-of matches a brute-force join oracle (multi-key)") {
    // seeded generator → reproducible; the oracle is the O(n·m) definition
    // the operator must never be asked to run at scale: join every left row
    // to ALL at-or-before right rows and take the (time, tiebreak)-max.
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 4) {
      val l = Seq.tabulate(120) { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong)
      }.toDF("k1", "k2", "t", "l_id")
      val r = Seq.tabulate(80) { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong)
      }.toDF("k1", "k2", "rt", "r_id")
      val tol = if (round % 2 == 0) Some(100L) else None
      val bcast = Some(round % 2 == 1) // alternate physical variants

      val got = AsOfJoin.leftAsOf(l, r,
        on = Seq("k1", "k2"), leftTimeCol = "t", rightTimeCol = "rt",
        rightTieBreak = Some("r_id"), toleranceMicros = tol,
        broadcastRight = bcast)
        .select("l_id", "r_id")

      val eligible = l.join(r, Seq("k1", "k2"))
        .filter(col("rt") <= col("t") &&
          tol.map(x => col("t") - col("rt") <= x).getOrElse(lit(true)))
        .groupBy("l_id")
        .agg(max(struct(col("rt"), col("r_id"))).getField("r_id").as("r_id"))
      val expected = l.select("l_id").join(eligible, Seq("l_id"), "left")

      val diff = got.exceptAll(expected).union(expected.exceptAll(got))
      assert(diff.isEmpty,
        s"round $round (tol=$tol) diverged:\n${diff.limit(10).collect().mkString("\n")}")
    }
  }

  test("optimizer rule pushes left-only filters through to the parquet scan") {
    // parquet-backed on both sides: the claim under test is not just "the
    // Filter moved below the node" but the 100 TB one — the predicate
    // reaches the left scan as a parquet pushed filter, while the
    // right-referencing conjunct stays above the join (filtering the
    // reference side would change which row is "most recent").
    val events = SparkEntry.loadEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val joined = AsOfJoin.leftAsOf(clicks, views,
      on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "v_ts",
      rightTieBreak = Some("view_id"))
    val filtered = joined.filter(col("click_id") === 42L && col("view_id").isNotNull)

    val optimized = filtered.queryExecution.optimizedPlan
    val node = optimized.collectFirst { case n: AsOfJoinNode => n }.get
    assert(node.left.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSeq.contains("event_id")
      case _ => false
    }, s"left-only filter not pushed below the as-of join:\n$optimized")
    assert(optimized.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).exists(_ == "view_id") &&
          f.exists(_.isInstanceOf[AsOfJoinNode])
      case _ => false
    }, s"right-side filter should remain above the join:\n$optimized")

    // and all the way into the physical scan's pushed filters
    filtered.count() // finalize AQE so the real scans are reachable
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def realFileScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec    => Seq(f)
      case a: AdaptiveSparkPlanExec => realFileScans(a.executedPlan)
      case q: QueryStageExec        => realFileScans(q.plan)
    }.flatten
    val scans = realFileScans(filtered.queryExecution.executedPlan)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("event_id"))),
      scans.map(_.metadata.getOrElse("PushedFilters", "?")).mkString("; "))
  }
}
