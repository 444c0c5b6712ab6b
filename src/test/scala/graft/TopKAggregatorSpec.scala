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
}
