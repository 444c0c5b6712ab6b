package graft

import graft.etl.TradeEtl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3): dedup idempotence,
  * valid ∪ invalid partition totality, exception-array ordering, and
  * timestamp 3-format round-trips.
  *
  * Uses raw ScalaCheck generators sampled with a fixed seed (the
  * scalatestplus bridge is not in the offline artifact cache). Sample counts
  * are small on purpose — every case spins real Spark jobs.
  */
class EtlPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tradeIdGen = Gen.chooseNum(0, 30).map(i => f"TRD$i%06d")

  test("dedup by key is idempotent and keys become unique") {
    for (ids <- samples(Gen.nonEmptyListOf(tradeIdGen), 5)) {
      val df = ids.map(id => (id, "x")).toDF("trade_id", "payload")
      val once = TradeEtl.dedupByTradeId(df)
      val twice = TradeEtl.dedupByTradeId(once)
      assert(once.count() == ids.distinct.size.toLong)
      assert(twice.count() == once.count())
      assert(once.select("trade_id").distinct().count() == once.count())
    }
  }

  private val enrichedCols = Seq(
    "trade_id", "timestamp", "symbol", "quantity", "price", "buyer_id",
    "seller_id", "trade_status", "external_ref_id", "our_trade_id",
    "counterparty_timestamp", "counterparty_symbol", "counterparty_quantity",
    "counterparty_price", "counterparty_id", "company_name", "sector", "is_active")

  test("valid and invalid partition the validated set totally") {
    val cell = Gen.zip(
      Gen.oneOf("100", "-1", "0", "abc", "", "7"),
      Gen.oneOf("10.5", "-2", "0", "xyz", "1.0"))
    for (rows <- samples(Gen.nonEmptyListOf(cell), 5)) {
      val df = rows.zipWithIndex.map { case ((q, p), i) =>
        (s"T$i", "2024-01-15T10:00:00.000Z", "AAPL", q, p, "B", "S", "EXECUTED",
          null: String, null: String, null: String, null: String, null: String,
          null: String, null: String, "Apple Inc", "Tech", "true")
      }.toDF(enrichedCols: _*)
      val v = TradeEtl.validate(df, 0.01).cache()
      val total = v.count()
      val valid = v.filter(col("is_valid")).count()
      val invalid = v.filter(!col("is_valid")).count()
      assert(valid + invalid == total)
      assert(v.filter(!col("is_valid") && col("exception_type").isNull).count() == 0)
      assert(v.filter(col("is_valid") && col("exception_type").isNotNull).count() == 0)
      v.unpersist()
    }
  }

  test("exception codes always appear in SYMBOL→QUANTITY→PRICE order") {
    val cases = Gen.zip(
      Gen.oneOf("100", "-1", "abc"),
      Gen.oneOf("10.5", "-2", "xyz"),
      Gen.oneOf(Some("Apple Inc") -> "true", Some("Old Co") -> "false", None -> null))
    for ((q, p, (company, active)) <- samples(cases, 10)) {
      val df = Seq(
        ("T1", "ts", "SYM", q, p, "B", "S", "EXECUTED",
          null: String, null: String, null: String, null: String, null: String,
          null: String, null: String, company.orNull, null: String, active),
      ).toDF(enrichedCols: _*)
      val types = TradeEtl.validate(df, 0.01)
        .select("exception_types").head().getSeq[String](0)
      val order = Seq("SYMBOL_INVALID", "QUANTITY_INVALID", "PRICE_INVALID")
      assert(types == order.filter(types.contains), s"q=$q p=$p company=$company")
      assert(types.distinct == types)
    }
  }

  test("timestamp round-trip: ISO and US formats re-render to the same instant") {
    val hm = Gen.zip(Gen.chooseNum(0, 23), Gen.chooseNum(0, 59))
    val pairs = samples(hm, 8)
    val rows = pairs.zipWithIndex.flatMap { case ((h, m), i) =>
      val iso = f"2024-03-07T$h%02d:$m%02d:11.000Z"
      val us = f"3/7/2024 $h%d:$m%02d:11"
      Seq((s"iso$i", iso, iso), (s"us$i", us, iso))
    }
    val df = rows.toDF("id", "timestamp", "expected")
      .select(col("id"), col("expected"), date_format(
        TradeEtl.normalizeTimestamp(col("timestamp")),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("out"))
    val bad = df.filter(col("out") =!= col("expected") || col("out").isNull)
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }
}
