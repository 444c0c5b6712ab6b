package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate-scale probe for the MERGE-ON-READ read tax, BOTH tombstone
  * kinds on identical data and identical deletes:
  *  - EQUALITY keys: a ~10M-row catalog table takes a ~1.2M-distinct-key
  *    MOR delete; doomed keys load once per executor as one sorted
  *    `long[]` and every row probes by binary search.
  *  - POSITIONAL vector: the same delete committed as (file, position)
  *    pairs; readers probe a per-file BITMAP by the running row ordinal —
  *    one shift+mask, no key column read, no search.
  * The SQL full-scan aggregate is timed before and after each delete;
  * checksums pin that both kinds delete exactly the same rows. Prints
  * one JSON line with all medians, the per-executor footprints of both
  * representations, and the two read-tax ratios.
  *
  * Usage: `sbt "runMain graft.MorGateProbe [sfDir] [iters]"`.
  */
object MorGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    // key modulus: doomed keys are `l_orderkey % keyMod == 1` — mod 2 is
    // the original ~1.2M-key gate-scale delete; mod 20 / mod 200 measure
    // the ~120k / ~12k points of the equality-vs-positional crossover
    val keyMod = args.lift(2).map(_.toLong).getOrElse(2L)
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
      spark, t, col("l_orderkey") % keyMod === 1L, "l_orderkey",
      // the probe MEASURES the equality leg at every scale — force it
      // past the cost-crossover default up to the memory ceiling
      maxKeys = graft.sources.VersionedTable.MorMaxDeleteKeys)
    val deleteSec = (System.nanoTime() - t0) / 1e9
    val doomedKeys = spark.sql(
      "SELECT count(DISTINCT l_orderkey) FROM gmg.default.mor VERSION AS OF 1 " +
        s"WHERE l_orderkey % $keyMod = 1").collect()(0).getLong(0)
    agg() // warm the post-delete plan (includes the first key-set load)
    val after = (1 to iters).map(_ => timeIt(agg()))
    // checksum: the post-delete scan equals the even-key filter pre-delete
    val expect = spark.sql(
      s"""SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
        |CAST(sum(l_extendedprice * 0.01) AS BIGINT) AS c
        |FROM gmg.default.mor VERSION AS OF 1
        |WHERE l_orderkey % $keyMod <> 1""".stripMargin).collect()(0).getLong(0)
    require(after.head._2 == expect,
      s"MOR scan checksum mismatch: got ${after.head._2}, want $expect")

    // POSITIONAL twin: identical base table, identical predicate, the
    // delete committed as a deletion vector instead of keys
    val t2 = s"$root/default/morp"
    graft.sources.VersionedTable.commit(
      big.repartitionByRange(32, col("l_orderkey")), t2, append = false)
    def agg2(): Long = spark.sql(
      """SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
        |CAST(sum(l_extendedprice * 0.01) AS BIGINT) AS c
        |FROM gmg.default.morp""".stripMargin).collect()(0).getLong(0)
    agg2() // warm
    val beforeP = (1 to iters).map(_ => timeIt(agg2()))
    val tp0 = System.nanoTime()
    graft.sources.VersionedTable.deleteWherePositional(
      spark, t2, col("l_orderkey") % keyMod === 1L)
    val deletePosSec = (System.nanoTime() - tp0) / 1e9
    val doomedRows = spark.sql(
      "SELECT count(*) FROM gmg.default.morp VERSION AS OF 1 " +
        s"WHERE l_orderkey % $keyMod = 1").collect()(0).getLong(0)
    agg2() // warm the post-delete plan (first bitmap load)
    val afterP = (1 to iters).map(_ => timeIt(agg2()))
    require(afterP.head._2 == expect,
      s"positional MOR scan checksum mismatch: got ${afterP.head._2}, want $expect")
    // bitmap footprint: rows/8 bytes per referenced file ⇒ rows/8 total
    val rows = 16L * li0.count()
    val bitmapMb = rows / 8.0 / 1048576.0

    val b = median(before.map(_._1))
    val a = median(after.map(_._1))
    val bp = median(beforeP.map(_._1))
    val ap = median(afterP.map(_._1))
    println(
      f"""{"probe":"mor_gate_read_tax","sf_dir":"$sfDir","iters":$iters,"key_mod":$keyMod,""" +
        f""""rows":$rows,"doomed_keys":$doomedKeys,"doomed_rows":$doomedRows,""" +
        f""""keyset_mb_per_executor":${doomedKeys * 8 / 1048576.0}%.1f,""" +
        f""""bitmap_mb_per_executor":$bitmapMb%.1f,""" +
        f""""delete_sec":$deleteSec%.3f,"delete_pos_sec":$deletePosSec%.3f,""" +
        f""""scan_before_sec":$b%.3f,"scan_after_sec":$a%.3f,""" +
        f""""after_over_before":${a / b}%.3f,""" +
        f""""scan_before_pos_sec":$bp%.3f,"scan_after_pos_sec":$ap%.3f,""" +
        f""""after_over_before_pos":${ap / bp}%.3f}""")
    spark.stop()
  }
}
