package graft

import graft.functions.VectorExpressions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def df = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
        Row(2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
        Row(3L, Array(2.0f, 0.0f), Array(3.0f, 0.0f)),
        Row(4L, null, Array(1.0f, 1.0f))),
      schema)
  }

  test("vec_dot matches hand computation and is null-safe") {
    val rows = df.select(col("id"), vecDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 32.0) // 4+10+18
    assert(rows(1).getDouble(1) === 0.0)
    assert(rows(2).getDouble(1) === 6.0)
    assert(rows(3).isNullAt(1))
  }

  test("vec_cosine matches the zip_with/aggregate HOF formulation") {
    val hof = {
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      dot(col("a"), col("b")) / (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b"))))
    }
    val rows = df.filter(col("a").isNotNull)
      .select(vecCosine(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // bit-identical arithmetic order
    }
    // orthogonal → 0, parallel → 1
    val byId = df.select(col("id"), vecCosine(col("a"), col("b")).as("c")).orderBy("id").collect()
    assert(byId(1).getDouble(1) === 0.0)
    assert(math.abs(byId(2).getDouble(1) - 1.0) < 1e-12)
  }

  test("vec_cosine of a zero vector is 0.0, not NaN (NaN would top every desc sort)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val z = spark.createDataFrame(
      java.util.Arrays.asList(Row(Array(0.0f, 0.0f), Array(1.0f, 2.0f))), schema)
    val v = z.select(vecCosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(v == 0.0 && !v.isNaN)
  }

  test("int8 quant stats match hand computation, zero vector scales to 0") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("a", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Array(1.0f, -2.0f, 0.5f)), // mx=2, scale=63.5 → q=64,-127,32
        Row(2L, Array(0.0f, 0.0f)),        // zero vector
        Row(3L, Array(-1.5f))),            // single negative: q=-127
      schema)
    val r = d.select(col("id"), int8QuantStats(col("a")).as("q"))
      .select(col("id"), col("q.scale"), col("q.q_sum"), col("q.q_norm2"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 63.5)
    assert(r(0).getLong(2) == (64L - 127L + 32L))
    assert(r(0).getLong(3) == (64L * 64 + 127L * 127 + 32L * 32))
    assert(r(1).getDouble(1) == 0.0 && r(1).getLong(2) == 0L)
    assert(r(2).getLong(2) == -127L)
  }

  test("int8 quant stats survive the interpreted path") {
    val schema = StructType(Seq(StructField("a", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(Row(Array(0.3f, -0.7f, 0.1f))), schema)
    val expected = d.select(int8QuantStats(col("a"))).collect()(0).toString
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(d.select(int8QuantStats(col("a"))).collect()(0).toString == expected)
    }
  }

  test("vec_cosine survives both codegen and interpreted paths") {
    val expected = df.filter(col("a").isNotNull)
      .select(vecCosine(col("a"), col("b"))).collect().map(_.getDouble(0)).sorted
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interpreted = df.filter(col("a").isNotNull)
        .select(vecCosine(col("a"), col("b"))).collect().map(_.getDouble(0)).sorted
      assert(interpreted.sameElements(expected))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
