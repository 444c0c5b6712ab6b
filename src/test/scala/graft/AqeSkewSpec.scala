package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: the runtime half of the skew strategy (the manual
  * half is `Relational.saltedAgg`). A join where one key holds almost all
  * rows would put one reducer on the critical path; with AQE skew-join
  * enabled Spark splits the oversized partition into parallel sub-reads
  * at runtime. Thresholds are lowered here so the behavior triggers at
  * test scale — at 100 TB the defaults (256 MB) do the same job.
  */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")

      // key 0 carries ~300k rows; 99 other keys carry one row each
      val fact = spark.range(0, 300000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(1, 100).select(col("id").as("k"), col("id").as("v")))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")

      // collect() executes THIS queryExecution (count() would plan a new
      // one and leave this AdaptiveSparkPlan unfinalized)
      assert(joined.collect().length == 300000 + 99) // correctness first
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
