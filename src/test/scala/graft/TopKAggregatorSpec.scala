package graft

import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("aggregator top-k equals the rank-window top-k exactly") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val window = Similarity.bruteForceTopK(emb, numQueries = 10, k = 4).collect()
    val agg = Similarity.bruteForceTopKAgg(emb, numQueries = 10, k = 4).collect()
    assert(window.length == agg.length && window.length > 0)
    window.zip(agg).foreach { case (w, a) => assert(w == a, s"window=$w agg=$a") }
  }

  test("property: aggregator == sort-take-k under arbitrary partitioning") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val agg = new graft.functions.TopKAggregator[(Long, Double)](5, _._1, _._2)
    val gen = for {
      n <- Gen.choose(0, 60)
      items <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 30L), Gen.choose(-10.0, 10.0)))
      cuts <- Gen.listOf(Gen.choose(0, math.max(n, 1)))
    } yield (items, cuts.sorted.distinct)
    val prop = Prop.forAll(gen) { case (items, cuts) =>
      // split into arbitrary partitions, reduce each, merge in order
      val bounds = (0 +: cuts :+ items.size).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => items.slice(a, b) }
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val want = items.map { case (id, s) => (s, id) }
        .sortBy { case (s, id) => (-s, id) }.take(5).map { case (s, id) => (id, s) }
      got == want
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("vec_cosine and vec_dot are callable from SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT round(vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 9) AS c,
        |       vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("text kernels are callable from SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT
        |  array_jaccard(array('a','b','c'), array('b','c','d')) AS jac,
        |  shingles('abcdefghijkl', 8, 4) AS sh,
        |  alnum_tokens('Hello, World! 42', 1) AS toks""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 0.5)
    assert(r.getSeq[String](1) == Seq("abcdefgh", "efghijkl"))
    assert(r.getSeq[String](2) == Seq("hello", "world", "42"))
    // structural params must be literals — data-dependent width is rejected
    val e = intercept[Exception] {
      spark.sql("SELECT shingles('abc', length('xy'), 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
