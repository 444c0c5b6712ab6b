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
}
