package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B harness for the input-layout parallelism floor
  * (`graft.ops.Parallelism.floor`): runs the layout-sensitive ops with the
  * floor ON and OFF, interleaved A/B/A/B in ONE JVM, and prints
  * per-variant medians. The flag is a session conf read per plan
  * compilation, so both variants run against identical session state and
  * identical (driver-regenerated, typically single-row-group) fixtures —
  * the comparison isolates exactly the repartition's effect.
  *
  * Usage: `sbt "runMain graft.LayoutProbe"` (honors SPARK_GRAFT_SF_DIR).
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "5").toInt

    val targets: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("q_docs_pagerank", "q_docs_setsim_join", "q_agg_percentile",
        "q_docs_central_keep", "q_docs_lsh_pairs")
        .map(n => n -> SparkEntry.queries(n))

    def run(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(v: Seq[Double]): Double = v.sorted.apply((v.size - 1) / 2)

    // warmup both variants once so codegen/parquet init lands outside timings
    spark.conf.set("spark.graft.parallelismFloor", "false")
    run(targets.head._2)
    spark.conf.set("spark.graft.parallelismFloor", "true")
    run(targets.head._2)

    val rows = targets.map { case (name, fn) =>
      val on = Vector.newBuilder[Double]
      val off = Vector.newBuilder[Double]
      for (_ <- 1 to iters) {
        spark.conf.set("spark.graft.parallelismFloor", "false")
        off += run(fn)
        spark.conf.set("spark.graft.parallelismFloor", "true")
        on += run(fn)
        SparkEntry.resetSessionState(spark)
      }
      val (mOn, mOff) = (median(on.result()), median(off.result()))
      println(f"[layout] $name%-22s floor=ON $mOn%6.3f s  OFF $mOff%6.3f s  speedup ${mOff / mOn}%5.2fx")
      (name, mOn, mOff)
    }
    val speedups = rows.map { case (_, on, off) => off / on }
    println(f"[layout] median speedup ${median(speedups)}%5.2fx over ${rows.size} ops (iters=$iters, sf=$sfDir)")

    // RENDITION A/B for the exact percentile: the same lineitem data
    // written as ONE file (one scan partition — the compacted-upstream
    // shape) versus 32 files (full scan parallelism). With the floor in
    // place the two renditions should time within ~1.2x — the op's cost
    // must depend on the data, not on how a compactor happened to lay
    // out the input.
    spark.conf.set("spark.graft.parallelismFloor", "true")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_rend").toString
    li.coalesce(1).write.mode("overwrite").parquet(s"$tmp/one")
    li.repartition(32).write.mode("overwrite").parquet(s"$tmp/many")
    def timePct(path: String): Double = {
      val v = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Relational.percentiles(spark.read.parquet(path))
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      median(v)
    }
    timePct(s"$tmp/many") // warm the reader on the fresh files
    val tOne = timePct(s"$tmp/one")
    val tMany = timePct(s"$tmp/many")
    println(f"[layout] q_agg_percentile rendition A/B: 1-file $tOne%6.3f s  " +
      f"32-file $tMany%6.3f s  ratio ${tOne / tMany}%5.2fx (bar: ~1.2x)")
    spark.stop()
  }
}
