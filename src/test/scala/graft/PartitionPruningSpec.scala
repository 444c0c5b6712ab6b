package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned layout: writing a table partitioned on a coarse key means
  * later reads filtered on that key list only the matching directories —
  * partition pruning happens in the file index, before any I/O. At 100 TB
  * this (with bucketing for join keys) IS the storage strategy: date-
  * partition the facts, prune at scan, bucket the join keys.
  */
class PartitionPruningSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("date-partitioned write prunes non-matching partitions at read") {
    val out = SparkTestBase.tempDir("graft_part").toString
    val events = SparkEntry.loadEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("day").parquet(out)

    val days = events.select("day").distinct().count()
    assert(days > 1, "need multiple partitions for the test to mean anything")

    val firstDay = events.agg(min("day")).collect()(0).getDate(0).toString
    val pruned = spark.read.parquet(out).filter(col("day") === firstDay)
    val p = pruned.queryExecution.executedPlan.toString
    // the partition filter must be applied at the file index, not as a
    // post-scan row filter
    assert(p.contains("PartitionFilters: [isnotnull(day"), s"no partition filter:\n$p")
    // and correctness: pruned read equals the in-memory filter
    assert(pruned.count() ==
      events.filter(col("day") === firstDay).count())
  }
}
