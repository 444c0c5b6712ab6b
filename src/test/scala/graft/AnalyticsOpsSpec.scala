package graft

import graft.ops.{Dedup, Similarity, TextAnalysis, TimeOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the round-8 analytics additions, beyond the DuckDB
  * oracle's hash check: attribution's carry-forward semantics, the
  * time-to-convert filter direction, RFM quintile assignment, the
  * temperature-mixture target arithmetic, and the cluster-balance cap.
  */
class AnalyticsOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def events(rows: Seq[(Long, Long, String, String, Double)]) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
  }

  test("lastTouchAttribution credits the most recent prior touch, 'none' if absent") {
    val df = events(Seq(
      (1L, 1L, "click", "2024-01-01 10:00:00", 0.0),
      (2L, 1L, "purchase", "2024-01-01 11:00:00", 10.0), // ← click
      (3L, 1L, "view", "2024-01-01 12:00:00", 0.0),
      (4L, 1L, "error", "2024-01-01 12:30:00", 0.0), // non-touch: must not steal credit
      (5L, 1L, "purchase", "2024-01-01 13:00:00", 20.0), // ← view (through the error)
      (6L, 2L, "purchase", "2024-01-01 09:00:00", 5.0))) // ← none
    val out = TimeOps.lastTouchAttribution(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("click" -> ((1L, 10.0)), "view" -> ((1L, 20.0)), "none" -> ((1L, 5.0))))
  }

  test("timeToConvert counts calendar days from first signup to first purchase at-or-after") {
    val df = events(Seq(
      (1L, 1L, "signup", "2024-01-01 23:00:00", 0.0),
      (2L, 1L, "purchase", "2024-01-04 01:00:00", 1.0), // 3 calendar days
      (3L, 1L, "purchase", "2024-01-09 01:00:00", 1.0), // later purchase ignored
      (4L, 2L, "purchase", "2024-01-01 10:00:00", 1.0), // pre-signup purchase
      (5L, 2L, "signup", "2024-01-02 10:00:00", 0.0),   // → no conversion row
      (6L, 3L, "signup", "2024-01-05 10:00:00", 0.0),
      (7L, 3L, "purchase", "2024-01-05 12:00:00", 1.0))) // same day → 0
    val out = TimeOps.timeToConvert(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 1L, 3L -> 1L))
  }

  test("activeUsers: WAU is the 7-day trailing distinct-user union, not a DAU sum") {
    val df = events(Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00", 0.0),
      (2L, 1L, "view", "2024-01-01 11:00:00", 0.0), // same user/day: one DAU
      (3L, 1L, "view", "2024-01-03 10:00:00", 0.0), // same user again in-window
      (4L, 2L, "view", "2024-01-03 10:00:00", 0.0),
      (5L, 3L, "view", "2024-01-10 10:00:00", 0.0))) // outside day-3's window
    val out = TimeOps.activeUsers(df).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("2024-01-01") == ((1L, 1L)))
    // day 3: DAU 2 (users 1, 2); WAU 2 — user 1's two activity days dedup
    assert(out("2024-01-03") == ((2L, 2L)))
    // day 10: only user 3 remains in the trailing week
    assert(out("2024-01-10") == ((1L, 1L)))
  }

  test("sessionPaths truncates to the entry journey and splits on the gap") {
    val df = events(Seq(
      // user 1 session 1: view>click>purchase>view — 4th event truncated
      (1L, 1L, "view", "2024-01-01 10:00:00", 0.0),
      (2L, 1L, "click", "2024-01-01 10:05:00", 0.0),
      (3L, 1L, "purchase", "2024-01-01 10:10:00", 0.0),
      (4L, 1L, "view", "2024-01-01 10:15:00", 0.0),
      // >30 min gap → user 1 session 2: view>click
      (5L, 1L, "view", "2024-01-01 12:00:00", 0.0),
      (6L, 1L, "click", "2024-01-01 12:01:00", 0.0),
      // user 2: one two-event session with the same journey as session 2
      (7L, 2L, "view", "2024-01-01 09:00:00", 0.0),
      (8L, 2L, "click", "2024-01-01 09:02:00", 0.0)))
    val out = TimeOps.sessionPaths(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 2L, "view>click>purchase" -> 1L),
      s"got $out")
  }

  test("rfmSegments ranks quintiles with deterministic tiebreaks") {
    // 5 purchase-only users, strictly increasing frequency and monetary,
    // strictly decreasing recency ⇒ every quintile has exactly one user.
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map { i =>
        ((u * 10 + i).toLong, u.toLong, "purchase", f"2024-01-${u}%02d 10:00:00", u * 100.0)
      }
    }
    val out = TimeOps.rfmSegments(events(rows)).collect()
    val byUser = out.map(r => r.getLong(0) -> r).toMap
    // user 5 purchased last (recency 0) most often with the highest spend —
    // the best customer on every axis: r=5 (recency inverted: recent=best)
    val u5 = byUser(5L)
    assert(u5.getLong(u5.fieldIndex("recency_days")) == 0L)
    assert(u5.getLong(u5.fieldIndex("segment")) == 555L)
    val u1 = byUser(1L)
    assert(u1.getLong(u1.fieldIndex("recency_days")) == 4L)
    assert(u1.getLong(u1.fieldIndex("segment")) == 111L)
    assert(out.map(r => r.getLong(r.fieldIndex("f"))).sorted.sameElements(1L to 5L))
  }

  test("temperatureMixture hits the √n-proportional targets exactly") {
    val sparkS = spark
    import sparkS.implicits._
    // 97 docs: 81 'a' + 16 'b' ⇒ √-shares 9:4 ⇒ targets 27 and 12 of 39
    val docs = ((1 to 81).map(i => (i.toLong, "a")) ++ (1 to 16).map(i => (100L + i, "b")))
      .toDF("doc_id", "lang")
    val out = TextAnalysis.langTemperatureMixture(docs, budget = 39)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("a" -> 27L, "b" -> 12L))
    val targets = out.select("lang", "target").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(targets == Map("a" -> 27L, "b" -> 12L))
    // every selected rank is within the target prefix
    assert(out.filter(col("rnk") > col("target")).count() == 0)
  }

  test("mmrRerank trades relevance for diversity: near-duplicate loses to the diverse candidate") {
    val sparkS = spark
    import sparkS.implicits._
    // query 0 along e1; cands 1/2 nearly identical (2 slightly more
    // relevant), cand 3 equally relevant but on the mirrored axis.
    // Plain top-2 = {2, 1}; MMR round 2 penalizes 1 (sim≈1 to selected 2)
    // and picks 3 (sim≈0.81).
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.95f, 0.309f, 0f, 0f)),
      (2L, Array(0.951f, 0.309f, 0f, 0f)),
      (3L, Array(0.951f, -0.309f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(vecs, numQueries = 1, poolSize = 3, k = 2).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) == 2L, s"rank 1 must be the most relevant candidate: $out")
    assert(out(2L) == 3L, s"rank 2 must be the diverse candidate, not the near-dup: $out")
  }

  test("mmrRerank releases superseded rounds: at most one cache entry survives") {
    val sparkS = spark
    import sparkS.implicits._
    // library hygiene: the greedy loop persists per round, but each round
    // must release its predecessor and the pairwise pool/psim frames —
    // a long-lived session calling the operator repeatedly must not
    // accumulate cache entries (only the FINAL round may stay cached for
    // the returned plan; resetSessionState owns the session-level release)
    SparkEntry.resetSessionState(spark)
    val vecs = (0L to 30L).map(i =>
      (i, Array.tabulate(4)(d => math.cos(i * 0.7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.mmrRerank(vecs, numQueries = 3, poolSize = 8, k = 5).collect()
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.size <= 1,
      s"expected at most the final round cached, found ${live.size}: " +
        live.values.map(_.name).mkString("; "))
    SparkEntry.resetSessionState(spark)
  }

  test("bpeEncode applies the learned merges: hand-computed token counts") {
    val sparkS = spark
    import sparkS.implicits._
    // vocab {abc:3, abd:1} ⇒ merges learn 'a b' → 'ab c' → 'ab d' in
    // exactly 3 deterministic rounds; every word then encodes to 1 token
    val docs = Seq((1L, "abc abc"), (2L, "abc abd")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 6L, 2L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 6L, 2L)), s"doc2: ${out(2L)}")
  }

  test("gopherRules: each rule fails for exactly the planted reason") {
    val sparkS = spark
    import sparkS.implicits._
    // doc1: 35 words (34 distinct 4-char + 'the') — every rule passes
    val ok = ((1 to 34).map(i => f"w$i%03d") :+ "the").mkString(" ")
    // doc2: long enough but no stopword and one dominant word
    val dom = Seq.fill(40)("spam").mkString(" ")
    // doc3: too short
    val short = "tiny doc the end"
    val out = TextAnalysis.gopherRules(
      Seq((1L, ok), (2L, dom), (3L, short)).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getBoolean(d1.fieldIndex("passes")), s"doc1 must pass: $d1")
    assert(d1.getLong(d1.fieldIndex("mean_len_c")) == (34 * 4 + 3) * 100 / 35)
    val d2 = out(2L)
    assert(!d2.getBoolean(d2.fieldIndex("r_stop")) &&
      !d2.getBoolean(d2.fieldIndex("r_top")) && !d2.getBoolean(d2.fieldIndex("passes")),
      s"doc2 must fail stopword + dominance: $d2")
    assert(d2.getLong(d2.fieldIndex("top_bps")) == 10000L)
    val d3 = out(3L)
    assert(!d3.getBoolean(d3.fieldIndex("r_words")) && !d3.getBoolean(d3.fieldIndex("passes")),
      s"doc3 must fail word count: $d3")
  }

  test("clusterBalancedSample caps every cell and reports true cell sizes") {
    val sparkS = spark
    import sparkS.implicits._
    // Two tight clusters on orthogonal axes; seeds (stride 5) are vec 0 and 5,
    // one per cluster. Cluster x has 7 members, cluster y has 3.
    val vecs = ((0 to 6).map(i => (i.toLong, Array(1f, 0.01f * i, 0f, 0f))) ++
      (7 to 9).map(i => (i.toLong, Array(0.01f * (i - 7), 1f, 0f, 0f)))).toSeq
    // put the y-cluster seed at vec_id 5 by swapping ids 5 and 7
    val swapped = vecs.map {
      case (5L, _) => (5L, Array(0f, 1f, 0f, 0f))
      case (7L, v) => (7L, Array(1f, 0.05f, 0f, 0f))
      case other => other
    }
    val df = swapped.toDF("vec_id", "embedding")
    val out = Similarity.clusterBalancedSample(df, centroidStride = 5, cap = 4).collect()
    val byCell = out.groupBy(_.getLong(0))
    assert(byCell.keySet == Set(0L, 5L))
    assert(byCell(0L).length == 4, "7-member cell must be capped at 4")
    assert(byCell(5L).length == 3, "3-member cell keeps all members")
    assert(byCell(0L).forall(_.getLong(3) == 7L), "n_cell reports the uncapped size")
    assert(out.forall(_.getLong(1) <= 4L))
  }

  test("scd2History builds contiguous change intervals with one current row per user") {
    val df = events(Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00", 0.0),
      (2L, 1L, "view", "2024-01-01 11:00:00", 0.0), // repeat — collapses
      (3L, 1L, "click", "2024-01-01 12:00:00", 0.0),
      (4L, 1L, "view", "2024-01-01 13:00:00", 0.0), // back to view: NEW version
      (5L, 2L, "signup", "2024-01-01 09:00:00", 0.0)))
    val out = TimeOps.scd2History(df).collect()
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(u1.map(_.getString(2)).toSeq == Seq("view", "click", "view"))
    // intervals chain: version k's valid_to == version k+1's valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(4) == b.getTimestamp(3), "interval chain broken")
    }
    assert(u1.count(_.getBoolean(5)) == 1 && u1.last.getBoolean(5))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getBoolean(5) && u2.head.get(4) == null)
  }

  test("nearDupPageRank: symmetric triangle is a fixed point, isolated docs get the damped base") {
    val sparkS = spark
    import sparkS.implicits._
    // 3 identical docs form a fully-connected LSH cluster (same shingles ⇒
    // same buckets); 2 distinct docs stay isolated. N=5 ⇒ r0 = 2e8; each
    // triangle vertex has outdeg 2 and receives 2·(2e8 div 2) = 2e8, so
    // r = 3e7 + (85·2e8) div 100 = 2e8 — a fixed point. Isolated: 3e7.
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),
      (4L, "completely unrelated text about spark execution engines"),
      (5L, "another very different document discussing tokenizer training"))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupPageRank(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 200000000L)))
    assert(out(2L) == ((2L, 200000000L)))
    assert(out(3L) == ((2L, 200000000L)))
    assert(out(4L) == ((0L, 30000000L)))
    assert(out(5L) == ((0L, 30000000L)))
  }

  test("countMinSketch never underestimates; collisions only inflate") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha alpha beta beta gamma lambda mu nu xi omicron pi rho"),
      (3L, "alpha sigma tau upsilon phi chi psi omega beta gamma delta"))
      .toDF("doc_id", "text")
    // width 4 forces heavy collisions: estimates must still bound exact
    // counts from above, in every row of the output
    val tight = TextAnalysis.countMinSketch(docs, depth = 4, width = 4, topk = 30).collect()
    assert(tight.nonEmpty)
    tight.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // exact ordering: alpha and beta tie at 4, alpha wins the word tiebreak
    assert(tight.head.getString(0) == "alpha" && tight.head.getLong(1) == 4L)
  }

  test("centralKeep keeps the most central cluster member, ties to the lowest id") {
    val sparkS = spark
    import sparkS.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),
      (4L, "completely unrelated text about spark execution engines"),
      (5L, "another very different document discussing tokenizer training"))
      .toDF("doc_id", "text")
    val out = Dedup.centralKeep(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the symmetric triangle: all ranks equal (2e8) ⇒ tiebreak keeps doc 1
    assert(out(1L) == ((3L, 1L, 200000000L)))
    // singletons keep themselves at the damped base rank
    assert(out(4L) == ((1L, 4L, 30000000L)))
    assert(out(5L) == ((1L, 5L, 30000000L)))
  }

  test("nearDupTriangles counts each triangle once per member, none for isolated docs") {
    val sparkS = spark
    import sparkS.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup), // K3: one triangle, 3 members
      (4L, "completely unrelated text about spark execution engines"),
      (5L, "another very different document discussing tokenizer training"))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupTriangles(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusteringCoefficient is 10000 bps inside a complete dup family") {
    val sparkS = spark
    import sparkS.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),
      (4L, "completely unrelated text about spark execution engines"))
      .toDF("doc_id", "text")
    val out = Dedup.clusteringCoefficient(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // K3: every member has degree 2, one triangle ⇒ 2·1/(2·1) = 1.0
    assert(out == Map(1L -> ((2L, 10000L)), 2L -> ((2L, 10000L)), 3L -> ((2L, 10000L))))
  }

  test("bpeMerges learns the expected merge sequence with deterministic ties") {
    val sparkS = spark
    import sparkS.implicits._
    // the×4, cat×2, sat×1, a×1 (single char: no pairs — exercises the
    // sequence guard). Round 1: 't h'=4 ties 'h e'=4 → 'h e' wins (pair
    // asc) → 'he'. Round 2: 't he'=4 → 'the'. Round 3: 'a t'=3 → 'at'.
    val docs = Seq(
      (1L, "the the the cat a"),
      (2L, "the cat sat"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs).collect()
    val winners = out.filter(_.getLong(1) == 1L)
      .sortBy(_.getLong(0))
      .map(r => (r.getString(3), r.getLong(4)))
    assert(winners.toSeq == Seq(("he", 4L), ("the", 4L), ("at", 3L)))
    // round-1 statistics: 't h' and 'h e' both 4, 'a t' 3 ('at' from cat+sat)
    val r1 = out.filter(_.getLong(0) == 1L).map(r => r.getString(2) -> r.getLong(4)).toMap
    assert(r1("h e") == 4L && r1("t h") == 4L && r1("a t") == 3L)
  }
}
