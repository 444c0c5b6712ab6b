package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Parallelism

/** The input-layout parallelism floor: engages exactly on narrow
  * under-partitioned scans, and never probes (= never executes) a frame
  * with exchanges below it.
  */
class ParallelismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.01"

  private def partitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  test("single-row-group scan is floored to default parallelism") {
    // the driver-generated fixtures are single small files → the scan
    // plans 1 partition (coalesce(1) would NOT reproduce this: an
    // explicit Repartition is a caller's shaping decision, which the
    // floor deliberately leaves alone — pinned below)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assume(partitions(docs) * 2 <= spark.sparkContext.defaultParallelism)
    val floored = Parallelism.floor(docs)
    assert(partitions(floored) === spark.sparkContext.defaultParallelism)
  }

  test("floored frame returns identical rows") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = docs.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = Parallelism.floor(docs).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.sameElements(b))
  }

  test("shaped frame (aggregate below) is returned untouched — no probe, no job") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shaped = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = Parallelism.floor(shaped)
    assert(out eq shaped) // same object: not even re-planned
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter === jobsBefore, "floor() must not execute a shaped frame")
  }

  test("join below disqualifies the probe") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val joined = docs.as("a").join(docs.as("b"), Seq("doc_id"))
    assert(Parallelism.floor(joined) eq joined)
  }

  test("session-conf kill switch bypasses the floor") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").coalesce(1)
    spark.conf.set("spark.graft.parallelismFloor", "false")
    try assert(Parallelism.floor(docs) eq docs)
    finally spark.conf.unset("spark.graft.parallelismFloor")
  }

  test("explicit repartition/coalesce is a caller's shaping decision — untouched") {
    val one = spark.read.parquet(s"$dir/documents.parquet").coalesce(1)
    assert(Parallelism.floor(one) eq one)
  }
}
