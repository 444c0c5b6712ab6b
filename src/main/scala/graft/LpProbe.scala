package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the label-propagation vote rewrite: runs
  * `q_docs_lp_communities` with `spark.graft.lpLegacy` ON (r18 shape —
  * unpartitioned edge persist + row_number window vote) and OFF (the
  * dst-partitioned persist + max-struct aggregate vote), interleaved
  * A/B/A/B in ONE JVM against identical session state and fixtures, and
  * prints per-variant medians and minima. The flag is a session conf
  * read at plan build, the same protocol as [[LayoutProbe]].
  *
  * Usage: `sbt "runMain graft.LpProbe"` (honors SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_PROBE_ITERS).
  */
object LpProbe {
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
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "7").toInt
    val fn = SparkEntry.queries("q_docs_lp_communities")
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      SparkEntry.resetSessionState(spark)
      dt
    }
    def stats(v: Seq[Double]): (Double, Double) =
      (v.sorted.apply((v.size - 1) / 2), v.min)
    // warm both variants once
    spark.conf.set("spark.graft.lpLegacy", "true"); run()
    spark.conf.set("spark.graft.lpLegacy", "false"); run()
    val legacy = Vector.newBuilder[Double]
    val next = Vector.newBuilder[Double]
    for (_ <- 1 to iters) {
      spark.conf.set("spark.graft.lpLegacy", "true")
      legacy += run()
      spark.conf.set("spark.graft.lpLegacy", "false")
      next += run()
    }
    val (lMed, lMin) = stats(legacy.result())
    val (nMed, nMin) = stats(next.result())
    println(f"[lp] legacy med $lMed%6.3f s min $lMin%6.3f s | " +
      f"new med $nMed%6.3f s min $nMin%6.3f s | " +
      f"speedup med ${lMed / nMed}%5.2fx min ${lMin / nMin}%5.2fx " +
      f"(iters=$iters, sf=$sfDir)")
    println(s"[lp] legacy iters: ${legacy.result().map(t => f"$t%.2f").mkString(", ")}")
    println(s"[lp] new    iters: ${next.result().map(t => f"$t%.2f").mkString(", ")}")
    spark.stop()
  }
}
