package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the parquet test fixtures: ORC and
  * CSV round-trips preserving values, and the distributed JSON-lines sink
  * reading back with the same null-dropping record shape the golden-format
  * array sink uses.
  */
class FormatRoundTripSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    SparkTestBase.tempDir(prefix).toString

  test("ORC round-trip preserves schema and values") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val out = tmp("graft_orc")
    orders.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    val a = orders.agg(round(sum("o_totalprice"), 2)).collect()(0).getDouble(0)
    val b = back.agg(round(sum("o_totalprice"), 2)).collect()(0).getDouble(0)
    assert(a == b)
  }

  test("CSV round-trip with header reads back all-string (reference S1 semantics)") {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val out = tmp("graft_csv")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").csv(out)
    // no inferSchema: every column is StringType, as the reference relies on
    assert(back.schema.fields.forall(_.dataType == StringType))
    assert(back.count() == nation.count())
    // values survive the string round-trip
    val names = back.select("n_name").collect().map(_.getString(0)).toSet
    val orig = nation.select("n_name").collect().map(_.getString(0)).toSet
    assert(names == orig)
  }

  test("JSON-lines sink drops null fields and reads back") {
    val df = spark.sql(
      """SELECT * FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)) AS t(id, s)""")
    val out = tmp("graft_jsonl")
    graft.etl.JsonSink.writeJsonLines(df, out)
    // raw lines: the null field must be absent, not "s":null
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".json"))
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .toSeq
    assert(lines.length == 2)
    assert(lines.exists(_.contains("\"s\":\"a\"")))
    assert(!lines.exists(_.contains("null")))
    // and Spark reads it back with the null restored
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.filter(col("s").isNull).count() == 1)
  }
}
