package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the WIDENED-TABLE scan path: a mixed-generation table
  * (half its files written before an INT→BIGINT + FLOAT→DOUBLE widening,
  * half after) is scanned with
  *  - A: the round-15 path — explicit-schema vectorized reads, the
  *    parquet reader promoting INT32→LONG / FLOAT→DOUBLE natively
  *    inside the batch load (`vectorized=true` for every file);
  *  - B: the round-14 fallback, recreated via the measurement hook
  *    (`GraftVectorization.widenPromotionEnabled = false`) — any scan
  *    touching a pre-widening file drops to the row decoder.
  * The same full-scan aggregate is timed both ways on one binary;
  * checksums pin identical results. Prints one JSON line.
  *
  * Usage: `sbt "runMain graft.WidenProbe [sfDir] [iters]"`.
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_widen").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gwp", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gwp.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16x-replicated lineitem under NARROW types (INT key, FLOAT price):
    // the shape a table had before it outgrew them
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val big = spark.range(16).withColumnRenamed("id", "rep").crossJoin(li0)
      .select(
        (col("l_orderkey") % 1000000000L).cast("int").as("k"),
        col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("float").as("p"),
        col("rep"))
    import graft.sources.VersionedTable
    val t = s"$root/default/wide"
    VersionedTable.commit(
      big.filter(col("rep") < 8).drop("rep").repartition(32),
      t, append = false)
    VersionedTable.widenColumn(spark, t, "k",
      org.apache.spark.sql.types.LongType)
    VersionedTable.widenColumn(spark, t, "p",
      org.apache.spark.sql.types.DoubleType)
    VersionedTable.commit(
      big.filter(col("rep") >= 8).drop("rep")
        .withColumn("k", col("k").cast("long") + 5000000000L)
        .withColumn("p", col("p").cast("double"))
        .repartition(32),
      t, append = true)

    def agg(): Long = spark.sql(
      """SELECT count(*) + sum(k) % 1000000007 +
        |CAST(sum(q) AS BIGINT) + CAST(sum(p * 0.01) AS BIGINT) AS c
        |FROM gwp.default.wide""".stripMargin).collect()(0).getLong(0)
    def planOf(): String = spark.sql("SELECT k, q, p FROM gwp.default.wide")
      .queryExecution.executedPlan.toString
    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    // A: promoted vectorized reads (the shipping path)
    graft.sources.GraftVectorization.widenPromotionEnabled = true
    val vecPlan = planOf().contains("vectorized=true")
    agg() // warm
    val a = (1 to iters).map(_ => timeIt(agg()))
    // B: round-14 fallback — row decoder for the narrow generation
    graft.sources.GraftVectorization.widenPromotionEnabled = false
    val rowPlan = planOf().contains("vectorized=false")
    agg() // warm
    val b = (1 to iters).map(_ => timeIt(agg()))
    graft.sources.GraftVectorization.widenPromotionEnabled = true

    require(a.map(_._2).distinct.size == 1 &&
      a.head._2 == b.head._2 && b.map(_._2).distinct.size == 1,
      s"checksum mismatch: promoted=${a.head._2} fallback=${b.head._2}")
    val mA = median(a.map(_._1))
    val mB = median(b.map(_._1))
    println(s"""{"metric":"widened_scan_ab","promoted_sec":${f"$mA%.3f"},""" +
      s""""row_fallback_sec":${f"$mB%.3f"},""" +
      s""""speedup":${f"${mB / mA}%.2f"},""" +
      s""""promoted_vectorized":$vecPlan,"fallback_row":$rowPlan,""" +
      s""""checksum":${a.head._2},"iters":$iters}""")
    spark.stop()
  }
}
