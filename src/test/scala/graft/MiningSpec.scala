package graft

import graft.ops.{Dedup, Relational, Similarity, TextAnalysis, TimeOps}
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level pins for the round-7 additions, beyond the DuckDB oracle's
  * hash check: the statistical-aggregate definitions, the hard-negative
  * label contract, and the Zipf-table invariants.
  */
class MiningSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("bm25TopK is lazy: constructing the plan runs no Spark job") {
    val sparkS = spark
    import sparkS.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = Seq((1L, "spark join"), (2L, "table scan")).toDF("doc_id", "text")
      val plan = TextAnalysis.bm25TopK(docs, k = 3)
      Thread.sleep(500) // listener events are async; give a stray job time to surface
      assert(jobs.get() == 0,
        s"bm25TopK construction submitted ${jobs.get()} job(s) — N/T must be in-plan scalars")
      assert(plan.columns.toSeq ==
        Seq("query_id", "rank", "doc_id", "score_grid", "n_terms"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bm25TopK: tf saturation, idf weighting, and length normalization order as BM25 must") {
    val sparkS = spark
    import sparkS.implicits._
    // corpus built so the fixed query 'spark shuffle join fast' separates:
    // doc 1: the query term twice in a SHORT doc (high tf, low dl → top)
    // doc 2: the term once in a LONG doc (length-normalized below doc 1)
    // doc 3: only corpus-common filler (no query term → absent)
    val docs = Seq(
      (1L, "spark spark table"),
      (2L, "spark table table table table table table table table table"),
      (3L, "table table table"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q1 = out.filter(_._1 == 1L)
    assert(q1.map(_._3).toSeq == Seq(1L, 2L), s"expected doc 1 over doc 2, got ${q1.toSeq}")
    assert(q1(0)._4 > q1(1)._4, "doc 1's score must strictly exceed doc 2's")
    assert(!q1.exists(_._3 == 3L),
      "doc without any query-1 term must not appear under query 1")
    // ranks are contiguous from 1 within each query
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("containment near-dup scores sub-document inclusion that Jaccard understates") {
    val sparkS = spark
    import sparkS.implicits._
    val core = (1 to 30).map(i => s"token$i").mkString(" ")
    val extra = (1 to 20).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, core),                 // the short doc
      (2L, s"$core $extra"),      // contains doc 1 verbatim plus more
      (3L, (1 to 50).map(i => s"unrelated$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.ops.Dedup.containmentNearDup(docs, minContainment = 0.5)
      .collect().map(row => ((row.getLong(0), row.getLong(1)), row.getDouble(5))).toMap
    assert(r.contains((1L, 2L)), s"contained pair missing: $r")
    assert(r((1L, 2L)) == 1.0,
      "every shingle of the short doc appears in the long one")
    assert(!r.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not pair")
    // and symmetric Jaccard on the same pair is well below 1 — the
    // signal containment adds
    val jac = graft.ops.Dedup.ngramJaccardNearDup(docs, minJaccard = 0.0)
      .collect().map(row => ((row.getLong(0), row.getLong(1)), row.getDouble(2))).toMap
    assert(jac((1L, 2L)) < 0.8, s"jaccard should understate: ${jac((1L, 2L))}")
  }

  test("bm25 contribution stays exact far past the old BIGINT overflow bound") {
    val sparkS = spark
    import sparkS.implicits._
    // magnitudes at and beyond the 100 TB design point: T up to 2e16
    // corpus tokens, N up to 2e13 docs, saturated tf on long docs —
    // every case here overflows the old all-BIGINT numerator (> 2^63)
    val cases = Seq(
      // (q_idf,     tf,     g_t,                g_n,            dl)
      (23700000L, 10000L, 20000000000000L, 20000000000L, 50000L),
      (30000000L, 1000000L, 20000000000000000L, 20000000000000L, 1000000L),
      (1000000L, 500L, 10000000000000L, 1000000000L, 2000L),
      (7000000L, 1L, 20000000000000L, 20000000000L, 1L))
    val got = cases.toDF("q_idf", "tf", "g_t", "g_n", "dl")
      .select(graft.ops.TextAnalysis.bm25Contrib.as("c"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (qi0, tf0, t0, n0, dl0) =>
      val (qi, tf, t, n, dl) =
        (BigInt(qi0), BigInt(tf0), BigInt(t0), BigInt(n0), BigInt(dl0))
      assert(qi * 22 * tf * t > BigInt(Long.MaxValue),
        "boundary case must exceed the old BIGINT numerator bound")
      ((qi * 22 * tf * t) / (BigInt(10) * t * tf + BigInt(3) * t + BigInt(9) * n * dl)).toLong
    }
    assert(got == want, s"decimal(38,0) contribution must equal BigInt-exact: $got vs $want")
  }

  test("ewmaHourly: s1 = x1 then s = 0.75s + 0.25x, on the 1e-6 grid") {
    val sparkS = spark
    import sparkS.implicits._
    // hours 0,1,2 of one type with counts 4, 0, 0 → s = 4, 3, 2.25
    val base = 1700000000L
    val events = Seq(
      (1L, base, 7L, "view", 0.0), (2L, base + 60L, 7L, "view", 0.0),
      (3L, base + 120L, 7L, "view", 0.0), (4L, base + 180L, 8L, "view", 0.0))
      .map { case (id, ts, u, et, v) => (id, new java.sql.Timestamp(ts * 1000L), u, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // counts per hour: hour0 = 4 events... make three hours: shift two events
    val ev3 = events
      .withColumn("ts", expr(
        "CASE WHEN event_id = 3 THEN ts + INTERVAL 1 HOUR " +
          "WHEN event_id = 4 THEN ts + INTERVAL 2 HOUR ELSE ts END"))
    val out = TimeOps.ewmaHourly(ev3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // counts: 2, 1, 1 → s: 2, 1.75, 1.5625 → grid 2e6, 1.75e6, 1.5625e6
    assert(out.map(_._2).toSeq == Seq(2L, 1L, 1L))
    assert(out.map(_._3).toSeq == Seq(2000000L, 1750000L, 1562500L))
  }

  test("statsAgg matches closed-form moments on a deterministic frame") {
    val sparkS = spark
    import sparkS.implicits._
    // y = 2x exactly ⇒ corr = 1; x ∈ {1..4} ⇒ covar_samp(x, 2x) = 2·var_samp(x)
    // var_samp(1,2,3,4) = 5/3, so covar = 10/3 ≈ 3.33
    val df = Seq(
      ("A", 1.0, 2.0, 0.1, 0.0), ("A", 2.0, 4.0, 0.1, 0.0),
      ("A", 3.0, 6.0, 0.1, 0.0), ("A", 4.0, 8.0, 0.1, 0.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val r = Relational.statsAgg(df).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDouble(row.fieldIndex("corr_qty_price")) == 1.0)
    assert(row.getDouble(row.fieldIndex("covar_qty_price")) == 3.33)
    assert(row.getDouble(row.fieldIndex("sd_discount")) == 0.0) // constant column
    assert(row.getDouble(row.fieldIndex("var_tax")) == 0.0)
    assert(row.getLong(row.fieldIndex("cnt")) == 4L)
  }

  test("hardNegatives never returns the query's own label and ranks by cosine") {
    val sparkS = spark
    import sparkS.implicits._
    // 3 labels × orthogonal-ish axes; query 0 (label 0) must pick the
    // different-label vector closest to it, not its same-label twin.
    val vecs = Seq(
      (0L, 0, Array(1f, 0f, 0f, 0f)),
      (1L, 0, Array(0.99f, 0.1f, 0f, 0f)),  // same label — excluded
      (2L, 1, Array(0.9f, 0.4f, 0f, 0f)),   // best cross-label match
      (3L, 1, Array(0f, 1f, 0f, 0f)),
      (4L, 2, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.hardNegatives(vecs, numQueries = 1, k = 3).collect()
    assert(out.forall(r => r.getInt(r.fieldIndex("neg_label")) != 0),
      "a mined negative carried the query's own label")
    val ranked = out.sortBy(_.getLong(out.head.fieldIndex("rnk")))
    assert(ranked.head.getLong(ranked.head.fieldIndex("cand_id")) == 2L,
      "top hard negative should be the closest different-label vector")
    val sims = ranked.map(r => r.getDouble(r.fieldIndex("cos_sim")))
    assert(sims.sameElements(sims.sortBy(-_)), "negatives not sorted by cosine")
  }

  test("histogramAgg bins by exact floor arithmetic") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(0.0, 4999.99, 5000.0, 12000.0).map(p => Tuple1(p))
      .toDF("l_extendedprice")
    val r = Relational.histogramAgg(df).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("saltedJoin is result-identical to the plain join") {
    val sparkS = spark
    import sparkS.implicits._
    val orders = Seq((1L, 10L, 100.0), (2L, 10L, 50.0), (3L, 20L, 25.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, "SEG_A"), (20L, "SEG_B"), (30L, "SEG_C"))
      .toDF("c_custkey", "c_mktsegment")
    val salted = Relational.saltedJoin(orders, customer, salts = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSet == Set(("SEG_A", 2L, 150.0), ("SEG_B", 1L, 25.0)))
  }

  test("slidingEventWindow counts exactly the trailing hour per user") {
    val sparkS = spark
    import sparkS.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    // user 1: events at t=0, 30, 61 min — the 61-min event's 1h window
    // excludes t=0 (exactly 61 min earlier) but keeps t=30; user 2 is
    // isolated (partitions don't leak)
    val events = Seq(
      (1L, 1L, at(0), 1.0), (2L, 1L, at(30), 2.0), (3L, 1L, at(61), 4.0),
      (4L, 2L, at(30), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = Relational.slidingEventWindow(events).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(
      1L -> (1L, 1.0), 2L -> (2L, 3.0), 3L -> (2L, 6.0), 4L -> (1L, 8.0)))
  }

  test("funnelStages requires stage ORDER, not mere presence") {
    val sparkS = spark
    import sparkS.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    // user 1: view(0) click(10) purchase(20) — full funnel
    // user 2: click(0) view(10) purchase(20) — click BEFORE view: funnel
    //         stalls at view (purchase doesn't count without an ordered click)
    // user 3: view only
    val events = Seq(
      (1L, 1L, at(0), "view"), (2L, 1L, at(10), "click"), (3L, 1L, at(20), "purchase"),
      (4L, 2L, at(0), "click"), (5L, 2L, at(10), "view"), (6L, 2L, at(20), "purchase"),
      (7L, 3L, at(0), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = TimeOps.funnelStages(events).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3))).toMap
    assert(r == Map(
      1L -> (true, true, true),
      2L -> (true, false, false),
      3L -> (true, false, false)))
  }

  test("typoPairs blocking finds every distance-1 pair incl. front edits") {
    val sparkS = spark
    import sparkS.implicits._
    // crafted vocabulary: "cat"/"bat" (substitution at pos 1 — suffix leg),
    // "cat"/"cut" (pos 2 — first-char leg), "art"/"cart" (front insertion —
    // suffix-vs-full leg), "cat"/"dog" (no pair)
    val docs = Seq((1L, "cat bat cut art cart dog")).toDF("doc_id", "text")
    val pairs = TextAnalysis.typoPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // ("cart","cat") rides along: delete 'r' at position 3 is also distance 1
    assert(pairs == Set(("bat", "cat"), ("cat", "cut"), ("art", "cart"), ("cart", "cat")))
  }

  test("groupingSetsAgg emits exactly the requested sets with grouping_id") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val rows = Relational.groupingSetsAgg(df).collect()
    val byGid = rows.groupBy(_.getLong(rows.head.fieldIndex("gid")))
    // gid 1 = by returnflag (2 rows), gid 2 = by linestatus (2), gid 3 = total (1)
    assert(byGid.keySet == Set(1L, 2L, 3L))
    assert(byGid(1L).length == 2 && byGid(2L).length == 2 && byGid(3L).length == 1)
    assert(byGid(3L).head.getDouble(rows.head.fieldIndex("sum_qty")) == 7.0)
  }

  test("gapFillDaily emits explicit zero rows for silent days") {
    val sparkS = spark
    import sparkS.implicits._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val events = Seq(
      (1L, 1L, day(1)), (2L, 1L, day(1)), (3L, 1L, day(3)), // user 1 silent on day 2
      (4L, 2L, day(2)))                                     // user 2 active only mid-span
      .toDF("event_id", "user_id", "ts")
    val r = TimeOps.gapFillDaily(events).collect()
      .map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2)))
    assert(r.toSet == Set(
      (1L, "2024-01-01", 2L), (1L, "2024-01-02", 0L), (1L, "2024-01-03", 1L),
      (2L, "2024-01-01", 0L), (2L, "2024-01-02", 1L), (2L, "2024-01-03", 0L)))
  }

  test("bigramConditional probabilities sum to 1 per context") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramConditional(docs, minPair = 1L).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSet == Set(
      ("a", "b", 2L, 3L, 0.666667), ("a", "c", 1L, 3L, 0.333333),
      ("b", "a", 2L, 2L, 1.0)))
  }

  test("unigramEntropy matches the closed form on a uniform 2-word doc") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, "a a b b"), (2L, "x x x x")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramEntropy(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) == 0.693147, "uniform 2-symbol doc must score ln 2 nats")
    assert(r(2L) == 0.0, "single-symbol doc has zero entropy")
  }

  test("pmiCollocations matches the closed form on a skewed corpus") {
    val sparkS = spark
    import sparkS.implicits._
    // 8 docs of "x y" + 1 of "z w": PMI(x,y) = ln(c12·N1²/(N2·c1·c2))
    //   = ln(8·18² / (9·8·8)) = ln 4.5 ≈ 1.504077
    val docs = ((1 to 8).map(i => (i.toLong, "x y")) :+ (9L, "z w"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiCollocations(docs, minPair = 5L).collect()
    assert(r.length == 1)
    assert((r.head.getString(0), r.head.getString(1)) == ("x", "y"))
    assert(r.head.getDouble(r.head.fieldIndex("pmi")) == 1.504077)
  }

  test("incrementalDedup classifies exact, near, and new against the base") {
    val sparkS = spark
    import sparkS.implicits._
    val long1 = "the quick brown fox jumps over the lazy dog here" // 49 chars
    val long2 = "pack my box with five dozen brown liquor jugs now" // 50 chars
    // delta ids are multiples of 10: 0 = exact copy of base 1;
    // 20 = base 2's text + one trailing char (same 8-gram stride-4 shingle
    // set => identical MinHash => LSH near-dup, but different md5);
    // 30 = unrelated => new
    val docs = Seq(
      (0L, long1), (1L, long1),
      (20L, long2 + "x"), (2L, long2),
      (30L, "completely different content with nothing shared at all"))
      .toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(docs).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(0L -> "dup_exact", 20L -> "near_dup", 30L -> "new"))
  }

  test("minhashEstJaccard: identical docs estimate and measure exactly 1") {
    val sparkS = spark
    import sparkS.implicits._
    val text = "the quick brown fox jumps over the lazy dog here"
    val docs = Seq((1L, text), (2L, text),
      (3L, "totally unrelated content that shares no shingles at all"))
      .toDF("doc_id", "text")
    val r = Dedup.minhashEstJaccard(docs).collect()
    assert(r.length == 1, "only the identical pair is an LSH candidate")
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 2L)
    assert(r.head.getDouble(2) == 1.0 && r.head.getDouble(3) == 1.0)
  }

  test("simhashClusters groups identical token streams, isolates unrelated ones") {
    val sparkS = spark
    import sparkS.implicits._
    // identical text ⇒ identical fingerprint ⇒ Hamming 0 ⇒ one cluster.
    // (A one-token diff is NOT a safe near-dup fixture at this doc length:
    // with n tokens each 60-bit majority vote has margin O(√n), so a
    // single extra token can flip ≫3 bits — tolerance behavior is pinned
    // at corpus scale by the q_docs_simhash_pairs/clusters oracles.)
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, a), (2L, a), (10L, "one two three four five six"))
      .toDF("doc_id", "text")
    val r = Dedup.simhashClusters(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L), "identical docs must share a cluster")
    assert(r(10L) != r(1L), "unrelated doc stays its own cluster")
  }

  test("dowSeasonality maps Monday to isodow 1") {
    val sparkS = spark
    import sparkS.implicits._
    // 2024-01-01 is a Monday
    val events = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 13:30:00"), 5.0))
      .toDF("event_id", "ts", "value")
    val r = TimeOps.dowSeasonality(events).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 13L)
    assert(r.head.getLong(2) == 1L && r.head.getDouble(3) == 5.0)
  }

  test("hoppingEventAgg lands each event in exactly window/slide hops") {
    val sparkS = spark
    import sparkS.implicits._
    val events = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 01:07:00"), 10.0))
      .toDF("event_id", "ts", "value")
    val r = TimeOps.hoppingEventAgg(events).collect()
      .map(x => (x.getTimestamp(0).toString, x.getLong(1), x.getDouble(2)))
    // 4 hops: starts 00:15, 00:30, 00:45, 01:00 (each covers 01:07)
    assert(r.length == 4)
    assert(r.map(_._1).toSeq == Seq(
      "2024-01-01 00:15:00.0", "2024-01-01 00:30:00.0",
      "2024-01-01 00:45:00.0", "2024-01-01 01:00:00.0"))
    assert(r.forall { case (_, c, v) => c == 1L && v == 10.0 })
  }

  test("normalizeText collapses punctuation and whitespace canonically") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      (1L, "  Hello,   WORLD!! 42 "),
      (2L, "hello world 42"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(docs).collect()
    assert(r(0).getString(1) == "hello world 42")
    // punct/space variants collapse to the same fingerprint
    assert(r(0).getString(2) == r(1).getString(2))
    assert(r(0).getLong(3) == 14L)
  }

  test("dedupConsecutive keeps first events and transitions only") {
    val sparkS = spark
    import sparkS.implicits._
    def at(m: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
    // user 1: 5, 5, 7, 7, 5 → keep events 1 (first), 3 (5→7), 5 (7→5)
    val events = Seq(
      (1L, 1L, at(0), 5.0), (2L, 1L, at(1), 5.0), (3L, 1L, at(2), 7.0),
      (4L, 1L, at(3), 7.0), (5L, 1L, at(4), 5.0),
      (6L, 2L, at(0), 5.0)) // other user: independent run
      .toDF("event_id", "user_id", "ts", "value")
    val kept = TimeOps.dedupConsecutive(events).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 5L, 6L))
  }

  test("wordFrequency builds a consistent Zipf table (counts, ranks, coverage)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.wordFrequency(df).collect()
    val byWord = rows.map(r => r.getString(r.fieldIndex("word")) ->
      (r.getLong(r.fieldIndex("cnt")), r.getLong(r.fieldIndex("n_docs")))).toMap
    assert(byWord == Map("a" -> (4L, 2L), "b" -> (3L, 2L), "c" -> (1L, 1L), "d" -> (1L, 1L)))
    val ranks = rows.map(_.getLong(0))
    assert(ranks.sameElements(1L to 4L), "ranks must be dense from 1")
    val shares = rows.map(r => r.getDouble(r.fieldIndex("cum_share")))
    assert(shares.sameElements(shares.sorted), "cumulative share must be monotone")
    assert(math.abs(shares.last - 1.0) < 1e-9, "full vocabulary covers the corpus")
    // ties (c vs d, both cnt=1) break alphabetically
    assert(rows(2).getString(rows(2).fieldIndex("word")) == "c")
  }

  test("random negatives honor the label contract and are reproducible") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.randomNegatives(emb).collect()
    assert(a.nonEmpty)
    // every emitted negative is label-mismatched and never the query itself
    assert(a.forall(r => r.getInt(r.fieldIndex("neg_label")) != r.getInt(r.fieldIndex("query_label"))))
    assert(a.forall(r => r.getLong(r.fieldIndex("neg_id")) != r.getLong(0)))
    // per query: at most k rows, ranks dense from 1, no repeated negative
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getLong(rows.head.fieldIndex("rnk"))).sorted.sameElements(1L to rows.length))
      assert(rows.map(_.getLong(rows.head.fieldIndex("neg_id"))).distinct.length == rows.length)
    }
    // pure function of ids: a second invocation returns identical rows
    val b = Similarity.randomNegatives(emb).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("bigram surprisal scores rare transitions above corpus-typical ones") {
    val sparkS = spark
    import sparkS.implicits._
    // corpus bigram model: C(a,b)=3, C(b,a)=2, C(a,c)=1, C(a,d)=1 ⇒
    // C(a·)=5, C(b·)=2. doc 1 repeats the dominant a↔b loop; docs 2/3
    // each take an a→rare transition.
    val df = Seq(
      (1L, "a b a b a b"), (2L, "a c"), (3L, "a d"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source", "0L AS n_chars")
    val r = TextAnalysis.bigramSurprisal(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // grid arithmetic, closed form: q(ln5)=1609438, q(ln3)=1098612,
    // q(ln2)=693147 ⇒ doc1 = (3·(1609438−1098612) + 2·0)/5/1e6 = 0.3065;
    // docs 2/3 = 1609438/1e6 = 1.6094
    assert(r(1L) == ((5L, 0.3065)), s"$r")
    assert(r(2L) == ((1L, 1.6094)) && r(3L) == ((1L, 1.6094)), s"$r")
    assert(r(2L)._2 > r(1L)._2)
  }

  test("DSIR importance ranks target-vocabulary docs above off-target ones") {
    val sparkS = spark
    import sparkS.implicits._
    // two disjoint vocabularies: the en (target) slice writes X-words, the
    // zh slice writes Y-words. Docs 10/11 have no lang label weight of
    // their own beyond their features — the X-vocabulary doc must outscore
    // the Y-vocabulary doc purely through the hashed-ngram ratio model.
    val x = "alpha beta gamma delta epsilon"
    val y = "uno dos tres cuatro cinco"
    val df = Seq(
      (1L, s"$x $x", "en", "web", 0L),
      (2L, s"$x alpha beta", "en", "web", 0L),
      (3L, s"$y $y", "zh", "web", 0L),
      (4L, s"$y uno dos", "zh", "web", 0L),
      (10L, x, "xx", "probe", 0L),
      (11L, y, "xx", "probe", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.dsirScores(df).collect()
      .map(row => row.getLong(0) -> row.getLong(row.fieldIndex("score_q"))).toMap
    assert(r(10L) > r(11L),
      s"target-vocab probe must outscore off-target probe: $r")
    // and the target slice itself scores above the off-target slice
    assert(Seq(1L, 2L).map(r).min > Seq(3L, 4L).map(r).max, s"$r")
    // the margin is per-occurrence and substantial: every Y-feature pays
    // ln(1) − ln(cnt_r+1) while X-features pay ≈ ln(cnt_t+1) − ln(cnt_r+1),
    // so the probes separate by more than one whole grid-ln unit
    assert(r(10L) - r(11L) > 1000000L, s"$r")
  }
}
