package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Sorted-data-layout scan: the rewritten copy must round-trip exactly,
  * and — the point of the op — the parquet row-group statistics of the
  * sorted layout must let the pushed range filter skip most of the data,
  * where the same filter over an unsorted many-file write reads everything.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.01"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.queryExecution.toRdd.foreach(_ => ()) // execute THIS plan's metrics
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec    => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
    }.flatten
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("sorted layout round-trips the raw table's rows exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Relational.sortedLayoutScan(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = docs
      .filter(col("n_chars") >= 480L && col("n_chars") < 600L)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("z-ordered layout round-trips the rectangle exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Relational.zorderLayoutScan(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = docs
      .filter(col("n_chars") >= 480L && col("n_chars") < 600L &&
        col("doc_id") >= 0L && col("doc_id") < 100L)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("z-order prunes on BOTH rectangle dimensions where the 1-D sort prunes on one") {
    // larger corpus so file-granularity pruning has room to differ
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nIds = 500L
    val rect = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("n_chars") >= 480L && col("n_chars") < 600L &&
        col("doc_id") >= 0L && col("doc_id") < nIds)
      .select(col("doc_id"), col("n_chars"), col("source"))

    val zRows = scanOutputRows(
      Relational.zorderLayoutScan(docs, 480L, 600L, 0L, nIds))
    // 1-D control: the n_chars-sorted layout with the SAME rectangle —
    // its files have tight n_chars stats but full-width doc_id stats, so
    // the doc_id leg of the conjunction can't skip anything
    val sortedRows = scanOutputRows(rect(
      Relational.sortedLayoutScan(docs).sparkSession.read.parquet(
        // re-read the sorted layout's path through the public op: build it,
        // then apply the 2-D rectangle on the same files
        Relational.sortedLayoutScan(docs).inputFiles.map(
          _.replaceAll("/[^/]*$", "")).distinct.head)))
    val matches = rect(docs).count()
    assert(zRows < sortedRows,
      s"z-order read $zRows rows vs 1-D $sortedRows for $matches matches — no 2-D advantage")
    assert(zRows <= matches * 8 + 256,
      s"z-order scan not result-proportional: $zRows rows for $matches matches")
  }

  test("row-group stats of the sorted layout skip most of the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    val matching = docs.filter(col("n_chars") >= 480L).count()
    assert(matching < total / 4, s"range not selective: $matching of $total")

    val sortedRead = Relational.sortedLayoutScan(docs)
    val sortedScanRows = scanOutputRows(sortedRead)

    // control: same row-group granularity, no sort — stats are useless,
    // every group survives the pushed filter and the scan reads the table
    val unsortedPath = java.nio.file.Files.createTempDirectory("graft_layout_ctl")
    try {
      docs.orderBy("doc_id") // doc_id order ≈ random in n_chars
        .repartition(4)
        .write.mode("overwrite").option("maxRecordsPerFile", 64)
        .parquet(s"$unsortedPath/docs_unsorted")
      val unsortedScanRows = scanOutputRows(
        spark.read.parquet(s"$unsortedPath/docs_unsorted")
          .filter(col("n_chars") >= 480L && col("n_chars") < 600L)
          .select(col("doc_id"), col("n_chars"), col("source")))

      // the sorted layout must read a result-proportional slice; the
      // unsorted control reads (at least) half the table
      assert(sortedScanRows <= matching + 128, // matching groups + ragged edges
        s"sorted layout read $sortedScanRows rows for $matching matches")
      assert(unsortedScanRows > total / 2,
        s"control unexpectedly skipped: $unsortedScanRows of $total")
      assert(sortedScanRows * 2 < unsortedScanRows,
        s"no layout advantage: sorted=$sortedScanRows unsorted=$unsortedScanRows")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(unsortedPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
