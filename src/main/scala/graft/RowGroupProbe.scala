package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for IN-FILE row-group skipping (`GraftRowGroupFilter`): a
  * selective range aggregate over ONE key-sorted multi-row-group file,
  * queried twice through the SQL catalog in the same JVM —
  *
  *   A (baseline): the predicate is wrapped as `abs(k) BETWEEN ...`, which
  *     no scan can consume — no bounds, no row-group filter, the file
  *     decodes end to end and Spark filters above;
  *   B (feature): the same range pushed plainly — the scan's bounds
  *     become a parquet FilterPredicate and only the intersecting row
  *     groups decode.
  *
  * File-level pruning cannot contribute (there is ONE file on both
  * sides), so the B/A ratio isolates the row-group skip. Checksums must
  * match — the skip is invisible to results by construction.
  *
  * Usage: `sbt "runMain graft.RowGroupProbe [sfDir] [iters]"`.
  */
object RowGroupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_rg_probe").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.grg", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.grg.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = s"$root/default/probe"
    // amplified 16x with shifted keys (sortedness preserved), all 11
    // columns kept — the file must be big enough that DECODE, not task
    // overhead, dominates, or the skip is invisible at probe scale
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val span = li0.agg(max("l_orderkey")).collect()(0).getLong(0) + 1L
    val li = spark.range(16).crossJoin(li0)
      .withColumn("l_orderkey", col("l_orderkey") + col("id") * span)
      .drop("id")
    graft.sources.VersionedTable.commit(
      li.coalesce(1).sortWithinPartitions("l_orderkey"),
      t, append = false, statsCols = Seq("l_orderkey"),
      writeOptions = Map("parquet.block.size" -> (4 * 1024 * 1024).toString))

    // probe range: the top ~2% of the key space
    val r0 = li.agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
    val (mn, mx) = (r0.getLong(0), r0.getLong(1))
    val lo = mx - (mx - mn) / 50

    def agg(where: String): Long =
      spark.sql(
        s"""SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
           |CAST(sum(l_extendedprice * 0.01) AS BIGINT) +
           |sum(length(l_returnflag)) + sum(length(l_shipdate)) AS c
           |FROM grg.default.probe WHERE $where""".stripMargin)
        .collect()(0).getLong(0)

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // abs() is not a source filter and survives constant folding (keys
    // are positive, so the predicate is semantically identical) — the
    // baseline side therefore pushes NO bounds and decodes every group
    def full() = agg(s"abs(l_orderkey) >= $lo AND abs(l_orderkey) <= $mx")
    def pruned() = agg(s"l_orderkey >= $lo AND l_orderkey <= $mx")

    val w1 = full(); val w2 = pruned()
    require(w1 == w2, s"probe checksum mismatch: full=$w1 pruned=$w2")
    val runs = (1 to iters).map { _ =>
      val (sf, rf) = timeIt(full())
      val (sp, rp) = timeIt(pruned())
      require(rf == rp, "probe checksum diverged mid-run")
      (sf, sp)
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val f = median(runs.map(_._1))
    val p = median(runs.map(_._2))
    println(
      f"""{"probe":"rowgroup_skip_ab","sf_dir":"$sfDir","iters":$iters,""" +
        f""""full_decode_median_sec":$f%.3f,"rowgroup_pruned_median_sec":$p%.3f,""" +
        f""""pruned_over_full":${p / f}%.3f}""")
    spark.stop()
  }
}
