package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for NESTED columns under MOR tombstones: a documents-shaped
  * versioned table (`toks ARRAY<BIGINT>`, `meta STRUCT<lang,n>`,
  * `payload BINARY` — the engine's flagship multimodal shape) takes a
  * positional delete (the DEFAULT delete kind), then the same full-scan
  * aggregate over the nested values is timed
  *  - A: the shipping path — columnar batches with the recursive
  *    surviving-row copy (`vectorized=true` even under tombstones);
  *  - B: the round-16 fallback, recreated via the measurement hook
  *    (session conf `spark.graft.nestedMorCopy=false`) — any
  *    tombstoned file with a nested projection drops to the Group-API
  *    row decoder.
  * Checksums pin identical results on one binary. A second timing pair
  * measures the SELECTIVE case (an id-range predicate over the sorted
  * posdel'd table), where the columnar path additionally row-group-skips
  * with exact ordinals. Prints one JSON line.
  *
  * Usage: `sbt "runMain graft.NestedMorProbe [sfDir] [iters]"`.
  */
object NestedMorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val root = java.nio.file.Files.createTempDirectory("graft_nmor").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gnm", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gnm.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64x-replicated documents, reshaped to the nested flagship columns:
    // token-hash array, metadata struct, binary payload
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val big = spark.range(64).withColumnRenamed("id", "rep").crossJoin(docs)
      .select(
        (col("doc_id") * 64 + col("rep")).as("id"),
        expr("transform(split(text, ' '), w -> xxhash64(w))").as("toks"),
        struct(col("lang"), col("n_chars").cast("int").as("n")).as("meta"),
        col("text").cast("binary").as("payload"))
    import graft.sources.VersionedTable
    val t = s"$root/default/ndoc"
    VersionedTable.commit(
      big.repartitionByRange(32, col("id")).sortWithinPartitions("id"),
      t, append = false, statsCols = Seq("id"))
    // positional vectors over ~1/7 of the rows — the default delete kind
    VersionedTable.deleteWherePositional(spark, t, col("id") % 7L === 0L)

    def agg(): Long = spark.sql(
      """SELECT count(*) + sum(aggregate(toks, 0L, (a, x) -> pmod(a + pmod(x, 1000000007), 1000000007)))
        |  + sum(length(payload)) + sum(meta.n) AS c
        |FROM gnm.default.ndoc""".stripMargin).collect()(0).getLong(0)
    def aggSel(): Long = spark.sql(
      """SELECT count(*) + sum(aggregate(toks, 0L, (a, x) -> pmod(a + pmod(x, 1000000007), 1000000007)))
        |  + sum(length(payload)) + sum(meta.n) AS c
        |FROM gnm.default.ndoc WHERE id BETWEEN 80000 AND 96000""".stripMargin)
      .collect()(0).getLong(0)
    def planOf(): String =
      spark.sql("SELECT id, toks, meta, payload FROM gnm.default.ndoc")
        .queryExecution.executedPlan.toString
    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    // A: columnar surviving-row copy (the shipping path)
    spark.conf.set("spark.graft.nestedMorCopy", "true")
    val vecPlan = planOf().contains("vectorized=true")
    agg(); aggSel() // warm
    val a = (1 to iters).map(_ => timeIt(agg()))
    val aSel = (1 to iters).map(_ => timeIt(aggSel()))
    // B: round-16 fallback — Group-API row decoder under any tombstone
    spark.conf.set("spark.graft.nestedMorCopy", "false")
    val rowPlan = planOf().contains("vectorized=false")
    agg(); aggSel() // warm
    val b = (1 to iters).map(_ => timeIt(agg()))
    val bSel = (1 to iters).map(_ => timeIt(aggSel()))
    spark.conf.set("spark.graft.nestedMorCopy", "true")

    // ROW-GROUP SKIPPING under posdel, isolated: ONE sorted multi-group
    // file (64 KB groups), a positional delete, and a range hitting a
    // handful of groups — the columnar path seeks to the matching
    // groups with exact ordinals; the row path streams the whole file.
    val t2 = s"$root/default/ndoc1"
    VersionedTable.commit(
      big.coalesce(1).sortWithinPartitions("id"), t2, append = false,
      statsCols = Seq("id"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    VersionedTable.deleteWherePositional(spark, t2, col("id") % 7L === 0L)
    def aggRg(): Long = spark.sql(
      """SELECT count(*) + sum(aggregate(toks, 0L, (a, x) -> pmod(a + pmod(x, 1000000007), 1000000007)))
        |  + sum(length(payload)) + sum(meta.n) AS c
        |FROM gnm.default.ndoc1 WHERE id BETWEEN 80000 AND 84000""".stripMargin)
      .collect()(0).getLong(0)
    spark.conf.set("spark.graft.nestedMorCopy", "true")
    aggRg()
    val aRg = (1 to iters).map(_ => timeIt(aggRg()))
    spark.conf.set("spark.graft.nestedMorCopy", "false")
    aggRg()
    val bRg = (1 to iters).map(_ => timeIt(aggRg()))
    spark.conf.set("spark.graft.nestedMorCopy", "true")
    require(aRg.map(_._2).distinct.size == 1 &&
      bRg.map(_._2).distinct.size == 1 && aRg.head._2 == bRg.head._2,
      s"rg checksum mismatch: ${aRg.head._2} vs ${bRg.head._2}")

    require(a.map(_._2).distinct.size == 1 && b.map(_._2).distinct.size == 1 &&
      a.head._2 == b.head._2,
      s"checksum mismatch: columnar=${a.head._2} row=${b.head._2}")
    require(aSel.map(_._2).distinct.size == 1 &&
      bSel.map(_._2).distinct.size == 1 && aSel.head._2 == bSel.head._2,
      s"selective checksum mismatch: ${aSel.head._2} vs ${bSel.head._2}")
    val (mA, mB) = (median(a.map(_._1)), median(b.map(_._1)))
    val (mAs, mBs) = (median(aSel.map(_._1)), median(bSel.map(_._1)))
    val (mArg, mBrg) = (median(aRg.map(_._1)), median(bRg.map(_._1)))
    println(s"""{"metric":"nested_mor_ab","columnar_sec":${f"$mA%.3f"},""" +
      s""""row_fallback_sec":${f"$mB%.3f"},""" +
      s""""speedup":${f"${mB / mA}%.2f"},""" +
      s""""selective_columnar_sec":${f"$mAs%.3f"},""" +
      s""""selective_row_sec":${f"$mBs%.3f"},""" +
      s""""selective_speedup":${f"${mBs / mAs}%.2f"},""" +
      s""""rgskip_columnar_sec":${f"$mArg%.3f"},""" +
      s""""rgskip_row_sec":${f"$mBrg%.3f"},""" +
      s""""rgskip_speedup":${f"${mBrg / mArg}%.2f"},""" +
      s""""columnar_vectorized":$vecPlan,"fallback_row":$rowPlan,""" +
      s""""checksum":${a.head._2},"iters":$iters}""")
    spark.stop()
  }
}
