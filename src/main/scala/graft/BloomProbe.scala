package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for WRITE-SIDE PARQUET BLOOM FILTERS (`graft.bloom-cols`):
  * a point lookup on an UNCLUSTERED high-cardinality key over a
  * price-sorted multi-row-group table — the case zone maps cannot help
  * (every row group's key range spans the whole domain). Three legs, all
  * through the SQL catalog in one JVM:
  *
  *   A (full decode): the predicate wrapped as `abs(id) = x` — nothing
  *     pushes down, every row group decodes, Spark filters above;
  *   B (no bloom): `id = x` on a table WITHOUT bloom-cols — the pushed
  *     Eq leaf reaches parquet's stats/dictionary row-group evaluators
  *     only;
  *   C (bloom): `id = x` on the SAME data written with
  *     `graft.bloom-cols'='id'` — the bloom evaluator excludes the row
  *     groups that cannot hold the key before any page decodes.
  *
  * Checksums must match across legs — skipping is invisible to results.
  * Usage: `sbt "runMain graft.BloomProbe [sfDir] [iters]"`.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_probe").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gbl", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gbl.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // amplified 16x, SORTED BY PRICE: the id column is then scattered
    // across every row group — zone maps and per-group stats are useless
    // for an id point lookup, which is exactly bloom's case
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_extendedprice"), col("l_quantity"), col("l_returnflag"))
    val span = li0.agg(max("id")).collect()(0).getLong(0) + 1L
    val big = spark.range(16).withColumnRenamed("id", "rep").crossJoin(li0)
      .withColumn("id", col("id") + col("rep") * span)
      .drop("rep")
      .orderBy("l_extendedprice") // sorted by price → id scattered
      .coalesce(1)

    spark.sql(
      """CREATE TABLE gbl.default.b0
        |(id BIGINT, l_extendedprice DOUBLE, l_quantity DOUBLE,
        | l_returnflag STRING)""".stripMargin)
    spark.sql(
      """CREATE TABLE gbl.default.b1
        |(id BIGINT, l_extendedprice DOUBLE, l_quantity DOUBLE,
        | l_returnflag STRING)
        |TBLPROPERTIES('graft.bloom-cols'='id')""".stripMargin)
    val wo = Map("parquet.block.size" -> (4 * 1024 * 1024).toString)
    graft.sources.VersionedTable.commit(
      big, s"$root/default/b0", append = true, writeOptions = wo)
    graft.sources.VersionedTable.commit(
      big, s"$root/default/b1", append = true, writeOptions = wo)

    val probeId = big.select("id").limit(1).collect()(0).getLong(0)

    def agg(table: String, where: String): Long =
      spark.sql(
        s"""SELECT count(*) + CAST(sum(l_quantity) AS BIGINT) +
           |CAST(sum(l_extendedprice * 0.01) AS BIGINT) AS c
           |FROM gbl.default.$table WHERE $where""".stripMargin)
        .collect()(0).getLong(0)

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def full() = agg("b1", s"abs(id) = $probeId")
    def noBloom() = agg("b0", s"id = $probeId")
    def bloom() = agg("b1", s"id = $probeId")

    val (w1, w2, w3) = (full(), noBloom(), bloom())
    require(w1 == w2 && w2 == w3,
      s"probe checksum mismatch: full=$w1 noBloom=$w2 bloom=$w3")
    val runs = (1 to iters).map { _ =>
      val (sf, rf) = timeIt(full())
      val (sn, rn) = timeIt(noBloom())
      val (sb, rb) = timeIt(bloom())
      require(rf == rn && rn == rb, "probe checksum diverged mid-run")
      (sf, sn, sb)
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val f = median(runs.map(_._1))
    val nn = median(runs.map(_._2))
    val b = median(runs.map(_._3))
    println(
      f"""{"probe":"bloom_point_ab","sf_dir":"$sfDir","iters":$iters,""" +
        f""""full_decode_median_sec":$f%.3f,"stats_dict_median_sec":$nn%.3f,""" +
        f""""bloom_median_sec":$b%.3f,"bloom_over_full":${b / f}%.3f}""")
    spark.stop()
  }
}
