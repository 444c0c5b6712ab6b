package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused probe for the versioned table's zone-map data skipping:
  * builds a range-clustered table from `COPIES` key-shifted copies of
  * sf0.1 lineitem (under target/, never touching /root/testdata), then
  * times a ~1%-of-keyspace range read THROUGH the manifest prune
  * ([[graft.sources.VersionedTable.readWhere]]) against the same
  * predicate over the unpruned snapshot scan. Median of `ITERS`
  * noop-write materializations, same JVM, warmup absorbed — the same
  * discipline as tools/ab_probe.py. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_PROBE_COPIES (default 1), SPARK_GRAFT_PROBE_FILES
  * (default 64), SPARK_GRAFT_PROBE_ITERS (default 5).
  */
object ZoneMapProbe {
  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "1").toInt
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "64").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val span = 150000L // key-shift per copy, > max l_orderkey (149_999 at sf0.1)
    val big = (0 until copies).map(c =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(c * span)))
      .reduce(_ union _)

    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zonemap_probe")
    val table = s"$dir/t"
    graft.sources.VersionedTable.commit(
      big.repartitionByRange(files, col("l_orderkey")),
      table, append = false, statsCols = Seq("l_orderkey"))

    // ~1% of the keyspace, mid-table
    val lo = (copies.toLong * span) / 2
    val hi = lo + (copies.toLong * span) / 100

    def time(mk: () => DataFrame): Double = {
      val ts = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts((ts.size - 1) / 2)
    }
    def pruned() = graft.sources.VersionedTable
      .readWhere(spark, table, None, "l_orderkey", lo, hi)
    def unpruned() = graft.sources.VersionedTable.read(spark, table)
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)

    pruned().write.mode("overwrite").format("noop").save() // warmup
    unpruned().write.mode("overwrite").format("noop").save()
    val (kept, total) = graft.sources.VersionedTable
      .pruneCount(table, None, "l_orderkey", lo, hi)
    val nRows = pruned().count()
    require(nRows == unpruned().count(), "pruned and unpruned must agree")
    val tp = time(pruned _)
    val tu = time(unpruned _)
    println(s"""{"rows":${600000L * copies},"files":$total,"kept":$kept,""" +
      s""""range_rows":$nRows,"pruned_s":$tp,"unpruned_s":$tu,""" +
      s""""speedup":${(tu / tp * 100).round / 100.0}}""")
    spark.stop()
  }
}
