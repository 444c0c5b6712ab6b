package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved one-JVM A/B harness for the round-19 CC-family execution
  * rewrites, following the LayoutProbe protocol: the candidate change is a
  * session conf read per plan compilation, both variants run interleaved
  * A/B/A/B against identical session state and fixtures, and the medians
  * isolate exactly the rewrite's effect — the only measurement this box's
  * noisy-neighbor windows cannot corrupt (a loaded window inflates BOTH
  * variants of an interleaved pair equally in expectation).
  *
  * Gates probed (each defaults ON in production):
  *   - spark.graft.ccSingleKeyDedup — star-pass dedup rides a single-key
  *     hash(hi) exchange the window/next-aggregate reuses
  *   - spark.graft.ccFusedProbe — fixpoint bookkeeping fused into the
  *     round checkpoint via LAZY materialization
  *   - spark.graft.ckOverlap — centralKeep's PageRank leg materializes on
  *     a driver thread while the CC fixpoint runs
  *
  * Usage: `sbt "runMain graft.CcProbe [conf]"` (honors SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_PROBE_ITERS); `conf` defaults to all three gates together.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val confs =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq(
        "spark.graft.ccSingleKeyDedup",
        "spark.graft.ccFusedProbe",
        "spark.graft.ckOverlap")
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
      sys.env.get("SPARK_GRAFT_PROBE_TARGETS")
        .map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq("q_docs_clusters_stars", "q_docs_simhash_clusters",
          "q_emb_semdedup", "q_docs_clusters", "q_docs_central_keep"))
        .map(n => n -> SparkEntry.queries(n))

    def run(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(v: Seq[Double]): Double = v.sorted.apply((v.size - 1) / 2)
    def setAll(v: String): Unit = confs.foreach(c => spark.conf.set(c, v))

    // warm both variants once (codegen/parquet init outside timings)
    setAll("false"); run(targets.head._2)
    setAll("true"); run(targets.head._2)
    SparkEntry.resetSessionState(spark)

    val rows = targets.map { case (name, fn) =>
      val on = Vector.newBuilder[Double]
      val off = Vector.newBuilder[Double]
      for (_ <- 1 to iters) {
        // r20 protocol fix: reset session state between the OFF and ON
        // runs, not only after the pair — ops that persist internal frames
        // (shingles, buckets, pairs) otherwise hand the SECOND variant a
        // warm cache the first paid for, a systematic bias toward ON.
        setAll("false"); off += run(fn)
        SparkEntry.resetSessionState(spark)
        setAll("true"); on += run(fn)
        SparkEntry.resetSessionState(spark)
      }
      val (mOn, mOff) = (median(on.result()), median(off.result()))
      println(f"[cc-ab] $name%-26s ON $mOn%6.3f s  OFF $mOff%6.3f s  speedup ${mOff / mOn}%5.2fx")
      (name, mOn, mOff)
    }
    val speedups = rows.map { case (_, on, off) => off / on }
    println(f"[cc-ab] median speedup ${median(speedups)}%5.2fx over ${rows.size} ops " +
      f"(iters=$iters, confs=${confs.mkString("+")}, sf=$sfDir)")
    spark.stop()
  }
}
