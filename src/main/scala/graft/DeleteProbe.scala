package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused probe for the versioned table's DELETE strategy triangle:
  * merge-on-read tombstone ([[graft.sources.VersionedTable.deleteWhere]]),
  * file-granular copy-on-write ([[graft.sources.VersionedTable.deleteWhereCow]]),
  * and full logical overwrite — a ~1%-of-keyspace range delete against
  * identically range-clustered tables built from key-shifted copies of
  * sf0.1 lineitem (under target/, never touching /root/testdata).
  * For each strategy: the delete's own wall time and the cost of the
  * NEXT full-table read (the ongoing price a reader pays until
  * compaction). Same JVM for all strategies, warmed up, end states
  * verified row-identical. Prints one JSON line.
  *
  * Expected shape, which the run verifies rather than asserts: overwrite
  * rewrites the table (linear in table size); MOR's delete is a full
  * predicate scan but a tiny write, and its read path carries the
  * anti-join; COW's delete scans only the zone-map candidates and
  * rewrites only touched files (flat in table size for a clustered
  * range), and its read path is a pure scan.
  *
  * Env: SPARK_GRAFT_PROBE_COPIES (default 1), SPARK_GRAFT_PROBE_FILES
  * (default 64).
  */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    import graft.sources.VersionedTable
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "1").toInt
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "64").toInt
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
      .repartitionByRange(files, col("l_orderkey"))
      .persist()
    val nRows = big.count()

    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "delete_probe")
    val tables = Seq("mor", "cow", "ow").map { s =>
      val t = s"$dir/$s"
      VersionedTable.commit(big, t, append = false, statsCols = Seq("l_orderkey"))
      s -> t
    }.toMap
    big.unpersist()

    // delete ~1% of the keyspace, mid-table
    val lo = (copies.toLong * span) / 2
    val hi = lo + (copies.toLong * span) / 100
    val pred = col("l_orderkey") >= lo && col("l_orderkey") <= hi

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def readCount(t: String): (Long, Double) =
      timed(VersionedTable.read(spark, t).count())

    readCount(tables("mor")) // warmup: scan path + scheduler

    val (_, tDelMor) = timed(
      // this probe MEASURES the equality-tombstone leg: force it past
      // the cost-crossover default up to the memory ceiling
      VersionedTable.deleteWhere(spark, tables("mor"), pred, "l_orderkey",
        maxKeys = VersionedTable.MorMaxDeleteKeys))
    val (nMor, tReadMor) = readCount(tables("mor"))

    val (_, tDelCow) = timed(VersionedTable.deleteWhereCow(
      spark, tables("cow"), pred, bounds = Seq(("l_orderkey", lo, hi)),
      statsCols = Seq("l_orderkey")))
    val (nCow, tReadCow) = readCount(tables("cow"))

    val (_, tDelOw) = timed(VersionedTable.commit(
      VersionedTable.read(spark, tables("ow")).filter(!pred), tables("ow"),
      append = false, statsCols = Seq("l_orderkey")))
    val (nOw, tReadOw) = readCount(tables("ow"))

    require(nMor == nCow && nCow == nOw,
      s"end states disagree: mor=$nMor cow=$nCow ow=$nOw")
    val (kept, total) = VersionedTable.pruneCount(
      tables("cow"), Some(1L), "l_orderkey", lo, hi)
    def r2(d: Double) = (d * 100).round / 100.0
    println(s"""{"rows":$nRows,"deleted":${nRows - nMor},""" +
      s""""files":$total,"cow_candidates":$kept,""" +
      s""""mor_delete_s":${r2(tDelMor)},"mor_read_s":${r2(tReadMor)},""" +
      s""""cow_delete_s":${r2(tDelCow)},"cow_read_s":${r2(tReadCow)},""" +
      s""""ow_delete_s":${r2(tDelOw)},"ow_read_s":${r2(tReadOw)}}""")
    spark.stop()
  }
}
