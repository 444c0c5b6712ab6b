package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the catalog's SQL read path vs the programmatic
  * vectorized path — the adjudication artifact for the vectorized
  * partition readers (`GraftCatalogVectorReader`): both sides run the
  * same decode-heavy aggregate over the same versioned table in one
  * JVM, interleaved, and the medians are printed as one JSON line.
  *
  * Usage: `sbt "runMain graft.ScanProbe [sfDir] [iters]"`.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_scan_probe").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gprobe", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gprobe.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = s"$root/default/probe"
    graft.sources.VersionedTable.commit(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_linestatus"),
      t, append = false)

    // decode-heavy: two numeric sums plus full string materialization
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(
        count(lit(1)) + sum("l_quantity").cast("long") +
          sum(length(col("l_returnflag"))).cast("long") +
          sum(length(col("l_linestatus"))).cast("long"))
        .collect()(0).getLong(0)

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def sqlScan() = agg(spark.sql("SELECT * FROM gprobe.default.probe"))
    def apiScan() = agg(graft.sources.VersionedTable.read(spark, t))

    // warm both paths once, then interleave so JIT/page-cache drift
    // lands on both sides equally
    val w1 = sqlScan(); val w2 = apiScan()
    require(w1 == w2, s"probe checksum mismatch: sql=$w1 api=$w2")
    val runs = (1 to iters).map { _ =>
      val (sa, ra) = timeIt(apiScan())
      val (ss, rs) = timeIt(sqlScan())
      require(ra == rs, "probe checksum diverged mid-run")
      (sa, ss)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val api = median(runs.map(_._1))
    val sql = median(runs.map(_._2))
    println(
      f"""{"probe":"catalog_scan_ab","sf_dir":"$sfDir","iters":$iters,""" +
        f""""api_median_sec":$api%.3f,"sql_median_sec":$sql%.3f,""" +
        f""""sql_over_api":${sql / api}%.3f}""")
    spark.stop()
  }
}
