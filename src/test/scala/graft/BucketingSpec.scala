package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the 100 TB co-location strategy. Writing both join sides
  * bucketed (and sorted) on the join key means a later sort-merge join
  * reads co-located buckets and needs NO shuffle exchange at query time —
  * the shuffle is paid once at write time, amortized over every
  * subsequent join/aggregation on that key.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    // tables land in the default warehouse dir (./spark-warehouse,
    // gitignored); warehouse.dir is a static conf and can't move
    // mid-session. A fresh in-memory catalog doesn't know about dirs left
    // by previous JVMs, so clear the physical locations too.
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq("orders_b", "lineitem_b")) {
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))

    // force SMJ (no broadcast) so the exchange-free property is visible
    val p = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join must consume bucketed scans directly: nothing below the
      // SortMergeJoin may be an exchange (the aggregation shuffle above
      // the join is expected and allowed)
      assert(!plan.substring(plan.indexOf("SortMergeJoin")).contains("Exchange"),
        s"join inputs shuffled despite bucketing:\n$plan")
      // and the result is still correct
      val total = joined.agg(sum("cnt")).collect()(0).getLong(0)
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(total == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", p)
  }
}
