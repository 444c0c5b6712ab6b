package graft

import graft.ops.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two relational behaviors the DuckDB oracle cannot grade:
  * the HLL sketch's accuracy (approximate by design — we assert the
  * relative-error contract instead of a value), and the output-edge
  * serialization of list-typed aggregation state.
  */
class RelationalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("approx_count_distinct stays within the default 5% rsd contract (3-sigma)") {
    val sparkS = spark
    import sparkS.implicits._
    // 3 groups with known distinct cardinalities: 1000, 500, 50.
    val df = (0 until 10000).map { i =>
      val g = i % 3
      val card = g match { case 0 => 1000; case 1 => 500; case _ => 50 }
      (g.toString, (i / 3) % card)
    }.toDF("l_returnflag", "l_partkey")
    val approx = Relational.approxAgg(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.exactDistinctAgg(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, ex) <- exact) {
      val relErr = math.abs(approx(g).toDouble - ex) / ex
      assert(relErr <= 0.15, s"group $g: approx=${approx(g)} exact=$ex relErr=$relErr")
    }
  }

  test("collectAgg renders sorted lists as canonical comma-joined text") {
    val sparkS = spark
    import sparkS.implicits._
    val orders = Seq(
      (7L, 30L, "O"), (7L, 2L, "F"), (7L, 100L, "O"),
      (8L, 5L, "P"))
      .toDF("o_custkey", "o_orderkey", "o_orderstatus")
    val r = Relational.collectAgg(orders).collect()
    // numeric sort (2 < 30 < 100), not lexicographic ("10" < "2")
    assert(r(0).getString(1) == "2,30,100")
    assert(r(0).getString(2) == "F,O")
    assert(r(1).getString(1) == "5")
    // scalar string output — no array-typed columns at the edge
    assert(Relational.collectAgg(orders).schema.fields.forall(
      f => !f.dataType.typeName.startsWith("array")))
  }

  test("qualityReport flags injected nulls, duplicate keys, bounds, and FK orphans") {
    val sparkS = spark
    import sparkS.implicits._
    val orders = Seq(
      (Some(1L), Some(10L), Some(100.0)),  // clean
      (Some(1L), Some(10L), Some(50.0)),   // duplicate o_orderkey
      (Some(2L), None, Some(-5.0)),        // null custkey + nonpositive price
      (Some(3L), Some(99L), None))         // null price + FK orphan (99 ∉ dim)
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq(10L).toDF("c_custkey")
    val out = Relational.qualityReport(orders, customer).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("completeness_key") == ((0L, true)))
    assert(out("completeness_custkey") == ((1L, false)))
    assert(out("completeness_price") == ((1L, false)))
    assert(out("uniqueness_key_dups") == ((1L, false)))
    assert(out("bounds_nonpositive_price") == ((1L, false)))
    assert(out("bounds_max_price_cents") == ((10000L, true))) // informational
    // orphans: custkey 99 has no dim row; NULL custkey is a completeness
    // failure, not an orphan (anti-join null semantics keep it, so it
    // counts here too — both rows lack a dimension match)
    assert(out("referential_orphan_custkey")._2 == false)
  }
}
