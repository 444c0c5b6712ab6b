package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate-scale probe for the MERGE-ON-READ read tax under the new
  * primitive tombstone key sets: a ~10M-row catalog table takes a
  * ~1.2M-distinct-key MOR delete (well inside the 10M gate), and the
  * SQL full-scan aggregate is timed before and after — the doomed keys
  * load ONCE PER EXECUTOR (the immutable-file key-set cache) as one
  * sorted `long[]` (~9.6 MB at this key count; the old representation
  * was a boxed HashSet re-built per TASK) and every row probes by
  * binary search. Checksums verify the delete did exactly its job.
  * Prints one JSON line with the before/after medians and the
  * per-executor key-set footprint.
  *
  * Usage: `sbt "runMain graft.MorGateProbe [sfDir] [iters]"`.
  */
object MorGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_morgate").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gmg", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gmg.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16x key-shifted lineitem: ~9.6M rows, ~2.4M distinct keys
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val span = li0.agg(max("l_orderkey")).collect()(0).getLong(0) + 1L
    val big = spark.range(16).withColumnRenamed("id", "rep").crossJoin(li0)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * span)
      .drop("rep")
    val t = s"$root/default/mor"
    graft.sources.VersionedTable.commit(
      big.repartitionByRange(32, col("l_orderkey")), t, append = false)

    def agg(): Long = spark.sql(
      """SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
        |CAST(sum(l_extendedprice * 0.01) AS BIGINT) AS c
        |FROM gmg.default.mor""".stripMargin).collect()(0).getLong(0)

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    agg() // warm
    val before = (1 to iters).map(_ => timeIt(agg()))
    // the delete: every odd key — ~1.2M distinct doomed keys, one
    // tombstone commit, no data file rewritten
    val t0 = System.nanoTime()
    graft.sources.VersionedTable.deleteWhere(
      spark, t, col("l_orderkey") % 2L === 1L, "l_orderkey")
    val deleteSec = (System.nanoTime() - t0) / 1e9
    val doomedKeys = spark.sql(
      "SELECT count(DISTINCT l_orderkey) FROM gmg.default.mor VERSION AS OF 1 " +
        "WHERE l_orderkey % 2 = 1").collect()(0).getLong(0)
    agg() // warm the post-delete plan (includes the first key-set load)
    val after = (1 to iters).map(_ => timeIt(agg()))
    // checksum: the post-delete scan equals the even-key filter pre-delete
    val expect = spark.sql(
      """SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
        |CAST(sum(l_extendedprice * 0.01) AS BIGINT) AS c
        |FROM gmg.default.mor VERSION AS OF 1
        |WHERE l_orderkey % 2 = 0""".stripMargin).collect()(0).getLong(0)
    require(after.head._2 == expect,
      s"MOR scan checksum mismatch: got ${after.head._2}, want $expect")

    val b = median(before.map(_._1))
    val a = median(after.map(_._1))
    println(
      f"""{"probe":"mor_gate_read_tax","sf_dir":"$sfDir","iters":$iters,""" +
        f""""rows":${16L * li0.count()},"doomed_keys":$doomedKeys,""" +
        f""""keyset_mb_per_executor":${doomedKeys * 8 / 1048576.0}%.1f,""" +
        f""""delete_sec":$deleteSec%.3f,""" +
        f""""scan_before_sec":$b%.3f,"scan_after_sec":$a%.3f,""" +
        f""""after_over_before":${a / b}%.3f}""")
    spark.stop()
  }
}
