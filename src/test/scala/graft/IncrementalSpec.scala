package graft

import graft.ops.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the incremental data-management ops, beyond the
  * DuckDB oracle hash: last-writer-wins over conflicting changes, upsert
  * semantics for updates to absent keys, delete-of-absent no-ops, the
  * change-feed classification (including null payload transitions), the
  * merge ⊕ associativity contract, and the compaction packer's fill
  * bound.
  */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def base(rows: (Long, String, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("k", "status", "price_c")
  }
  private def changes(rows: (Long, String, Long, String, java.lang.Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("k", "op", "seq", "status", "price_c")
  }
  private def state(df: DataFrame): Map[Long, (String, Any, String)] =
    df.collect().map(r => r.getLong(0) -> ((
      Option(r.get(1)).map(_.toString).orNull,
      r.get(2),
      r.getString(3)))).toMap

  test("cdcApply: last writer wins, upsert on absent key, delete wins over earlier update") {
    val b = base((1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L))
    val c = changes(
      (1L, "U", 1L, "A", 150L), (1L, "U", 2L, "A2", 160L), // seq 2 wins
      (2L, "U", 1L, "B", 250L), (2L, "D", 2L, null, null), // delete wins
      (9L, "U", 1L, "NEW", 900L)) // update of absent key inserts
    val out = state(Incremental.cdcApply(b, c, "k"))
    assert(out == Map(
      1L -> (("A2", 160L, "cdc")),
      3L -> (("C", 300L, "base")),
      9L -> (("NEW", 900L, "cdc"))))
  }

  test("cdcApply: delete of an absent key is a no-op; null payload in a change is applied") {
    val b = base((1L, "A", 100L))
    val c = changes((7L, "D", 1L, null, null), (1L, "U", 1L, null, 110L))
    val out = state(Incremental.cdcApply(b, c, "k"))
    assert(out == Map(1L -> ((null, 110L, "cdc"))))
  }

  test("cdcApplyBroadcast equals cdcApply on every LWW/upsert/delete case") {
    val b = base((1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L))
    val c = changes(
      (1L, "U", 1L, "A", 150L), (1L, "U", 2L, "A2", 160L),
      (2L, "U", 1L, "B", 250L), (2L, "D", 2L, null, null),
      (7L, "D", 1L, null, null), // delete of absent key: no-op in both forms
      (9L, "U", 1L, "NEW", 900L))
    val merge = state(Incremental.cdcApply(b, c, "k"))
    val bcast = state(Incremental.cdcApplyBroadcast(b, c, "k"))
    assert(bcast == merge, s"broadcast form diverged:\n$bcast\nvs\n$merge")
  }

  test("changeDataFeed classifies insert/delete/update and skips unchanged rows") {
    val oldDf = base((1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L))
    val newDf = base((1L, "A", 100L), (2L, "B", 250L), (4L, "D", 400L))
    val out = Incremental.changeDataFeed(oldDf, newDf, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("changeDataFeed treats null→value and value→null as updates (null-safe compare)") {
    val s = spark; import s.implicits._
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val newDf = Seq((1L, Option("y")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val out = Incremental.changeDataFeed(oldDf, newDf, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "update", 2L -> "update")) // 3: null==null, unchanged
  }

  test("changeDataFeed on a key-only table still classifies inserts and deletes") {
    val s = spark; import s.implicits._
    // no shared payload columns: `same` must fold to vacuously-true, not
    // throw on an empty reduce — only membership changes emit
    val oldDf = Seq(1L, 2L, 3L).toDF("k")
    val newDf = Seq(2L, 3L, 4L).toDF("k")
    val out = Incremental.changeDataFeed(oldDf, newDf, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "delete", 4L -> "insert"))
  }

  test("cdcApply: a seq tie is broken deterministically by op, same in both forms") {
    val b = base((1L, "A", 100L), (2L, "B", 200L))
    val c = changes(
      (1L, "D", 5L, null, null), (1L, "U", 5L, "A2", 150L), // tie: U beats D
      (2L, "D", 7L, null, null), (2L, "I", 7L, "B2", 260L)) // tie: I beats D
    val merge = state(Incremental.cdcApply(b, c, "k"))
    val bcast = state(Incremental.cdcApplyBroadcast(b, c, "k"))
    assert(merge == Map(
      1L -> (("A2", 150L, "cdc")),
      2L -> (("B2", 260L, "cdc"))), s"tie not broken op-desc: $merge")
    assert(bcast == merge, s"broadcast form diverged on ties:\n$bcast\nvs\n$merge")
  }

  test("aggMerge: state ⊕ delta equals the one-shot aggregate for any split point") {
    val s = spark; import s.implicits._
    val rows = (1L to 200L).map(i => (i % 7, 1L, i))
    val full = rows.toDF("g", "n", "v").groupBy("g")
      .agg(sum("n").as("n"), sum("v").as("v"))
    for (cut <- Seq(0, 1, 99, 200)) {
      val a = rows.take(cut).toDF("g", "n", "v").groupBy("g")
        .agg(sum("n").as("n"), sum("v").as("v"))
      val b = rows.drop(cut).toDF("g", "n", "v").groupBy("g")
        .agg(sum("n").as("n"), sum("v").as("v"))
      val merged = Incremental.aggMerge(a, b, "g")
      assert(merged.union(full).distinct().count() == full.count(),
        s"merge at split $cut diverges from the one-shot aggregate")
    }
  }

  test("viewRefreshFromCdf handles group moves, emptied groups, and new groups") {
    val s = spark; import s.implicits._
    // old table: g=a {1,2}, g=b {3}; new table: 1 moves a→b with value
    // change, 3 deleted (b emptied... but 1 arrives), 4 inserted in c
    val state = Seq(("a", 2L, 30L), ("b", 1L, 300L)).toDF("g", "n_rows", "total_c")
    val cdf = Seq(
      (1L, "update", "a", "b", 10L, 15L),
      (3L, "delete", "b", null, 300L, 0L),
      (4L, "insert", null, "c", 0L, 400L))
      .toDF("k", "change_type", "old_g", "new_g", "old_v", "new_v")
      // delete rows carry null new-side, insert rows null old-side
      .withColumn("old_g", when(col("change_type") === "insert", lit(null)).otherwise(col("old_g")))
      .withColumn("new_g", when(col("change_type") === "delete", lit(null)).otherwise(col("new_g")))
      .withColumn("old_v", when(col("change_type") === "insert", lit(null)).otherwise(col("old_v")))
      .withColumn("new_v", when(col("change_type") === "delete", lit(null)).otherwise(col("new_v")))
    val out = Incremental.viewRefreshFromCdf(state, cdf, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a: {2} → (1, 20); b: 3 gone, 1 arrives → (1, 15); c: new → (1, 400)
    assert(out == Map("a" -> ((1L, 20L)), "b" -> ((1L, 15L)), "c" -> ((1L, 400L))))
  }

  test("viewRefreshFromCdf drops a group whose count reaches zero") {
    val s = spark; import s.implicits._
    val state = Seq(("a", 1L, 10L)).toDF("g", "n_rows", "total_c")
    val cdf = Seq((1L, "delete", "a", null: String, 10L, 0L))
      .toDF("k", "change_type", "old_g", "new_g", "old_v", "new_v")
    val out = Incremental.viewRefreshFromCdf(state, cdf, "g", "v")
    assert(out.count() == 0L)
  }

  test("HLL sketch state: merge is commutative and the estimate honors its error contract") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, hll_union}
    // 2000 distinct keys split unevenly; sketches must merge either way
    val a = (1L to 1500L).map(k => ("g", k)).toDF("g", "k")
      .groupBy("g").agg(hll_sketch_agg(col("k")).as("sk"))
    val b = (1200L to 2000L).map(k => ("g", k)).toDF("g", "k")
      .groupBy("g").agg(hll_sketch_agg(col("k")).as("sk2"))
    val j = a.join(b, "g")
    val ab = j.select(hll_sketch_estimate(hll_union(col("sk"), col("sk2"))))
      .collect()(0).getLong(0)
    val ba = j.select(hll_sketch_estimate(hll_union(col("sk2"), col("sk"))))
      .collect()(0).getLong(0)
    assert(ab == ba, "HLL union must be commutative")
    assert(math.abs(ab - 2000L) * 50L <= 2000L,
      s"estimate $ab breaches the 2% contract for 2000 exact")
  }

  test("ordersSketchMerge reports statuses whose orders fall entirely on one side of the cut") {
    val s = spark; import s.implicits._
    val before = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val after = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    // X: only pre-cut orders; Y: only post-cut; Z: both sides
    val orders = (
      (1L to 40L).map(k => (k, "X", before)) ++
      (41L to 80L).map(k => (k, "Y", after)) ++
      (81L to 100L).map(k => (k, "Z", before)) ++
      (101L to 120L).map(k => (k, "Z", after))
    ).toDF("o_custkey", "o_orderstatus", "o_orderdate")
    val out = Incremental.ordersSketchMerge(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set("X", "Y", "Z"), s"one-sided status dropped: ${out.keySet}")
    assert(out("X")._1 == 40L && out("Y")._1 == 40L && out("Z")._1 == 40L)
    out.foreach { case (st, (_, mOk, dOk)) =>
      assert(mOk && dOk, s"estimate contract breached for one-sided status $st")
    }
  }

  test("compactionPlan: every bin except possibly the head stays under target + largest file") {
    val s = spark; import s.implicits._
    val files = (1L to 100L).map(i => (i, (i * 37) % 900 + 100)).toDF("id", "sz")
    val target = 2000L
    val plan = Incremental.compactionPlan(files, "id", "sz", target).collect()
    val maxFile = 999L
    assert(plan.map(_.getLong(1)).sum == 100L) // every file assigned exactly once
    plan.foreach { r =>
      assert(r.getLong(2) < target + maxFile,
        s"bin ${r.getLong(0)} overfilled: ${r.getLong(2)}")
    }
    // deterministic: same inventory → same plan
    val again = Incremental.compactionPlan(files, "id", "sz", target).collect()
    assert(plan.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("orders CDC scenario: feed row counts reconstruct the batch's insert/update/delete split") {
    val s = spark; import s.implicits._
    // keys 1..200: base = %4≠3 (150 keys); updates %10∈{0,5} of base;
    // deletes %20=5 of base; inserts %4=3 (50 keys)
    val orders = (1L to 200L)
      .map(i => (i, i % 3, s"S${i % 2}", i * 10.0,
        java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val feed = Incremental.ordersCdcFeed(orders).groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts: %4=3 → 50 keys.
    // deletes: %4≠3 ∧ %20=5 → 5,25,45,…,185 → 10 keys (all ≡1 mod 4).
    // update candidates %10∈{0,5} ∧ %4≠3: 20 keys ending in 0 (even, never
    // ≡3) + 10 of the 20 ending in 5 (15,35,… are ≡3 → held out) = 30;
    // minus the 10 deleted → 20 updates survive.
    assert(feed == Map("insert" -> 50L, "delete" -> 10L, "update" -> 20L))
  }
}
