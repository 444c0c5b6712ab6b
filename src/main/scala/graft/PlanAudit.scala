package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Diagnostic main: executes selected queries with a deliberately raised
  * `spark.sql.shuffle.partitions` and reports what AQE actually did at
  * runtime — per-exchange shuffle bytes and the post-coalesce partition
  * counts. This is the evidence that the engine's plans leave partition
  * sizing to AQE (the 100 TB posture: set partitions high, let runtime
  * coalescing right-size them per stage) instead of hand-tuning per query.
  *
  * Usage: `runMain graft.PlanAudit [sfDir] [shufflePartitions] [q1,q2,...]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "200"
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("q_star_revenue", "q_docs_lsh_pairs")

    val spark = SparkSession.builder()
      .appName("graft-plan-audit")
      .withExtensions(new graft.functions.GraftExtensions)
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS queryExecution (a write/count would plan a fresh one
      // and leave this AdaptiveSparkPlan unfinalized with zeroed metrics)
      df.queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      val executed = df.queryExecution.executedPlan
      val finalPlan = executed match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // Descend through query-stage boundaries: a finalized AQE plan wraps
      // each exchange in a QueryStageExec whose materialized subtree hangs
      // off `plan`, not `children`.
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val below = p match {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
          case _ => p.children
        }
        (p +: below.flatMap(walk)) ++ p.subqueries.flatMap(walk)
      }
      val nodes = walk(finalPlan)
      println(s"== $name (shuffle.partitions=$parts, sf=$sfDir)")
      println(f"  wall: $wall%.2f s")
      nodes.collect { case e: ShuffleExchangeLike => e }.zipWithIndex.foreach {
        case (e, i) =>
          val size = e.metrics.get("dataSize").map(_.value).getOrElse(-1L)
          println(f"  exchange[$i]: dataSize=${size / 1024.0}%.0f KiB")
      }
      nodes.collect { case r: AQEShuffleReadExec => r }.zipWithIndex.foreach {
        case (r, i) =>
          println(s"  aqeRead[$i]: ${r.partitionSpecs.length} partitions after coalesce")
      }
      val bhj = nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
      val smj = nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
      if (bhj + smj > 0) println(s"  joins: broadcastHash=$bhj sortMerge=$smj")
      // Scan inventory: FileSourceScan read schemas are the column-pruning
      // evidence (a scan reading `text` twice means a pipeline was
      // duplicated instead of shared); InMemoryTableScans show where a
      // persisted frame is actually reused inside THIS plan.
      nodes.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.zipWithIndex.foreach { case (s, i) =>
        val cols = s.requiredSchema.fieldNames.mkString(",")
        println(s"  fileScan[$i]: [$cols]")
      }
      val imts = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
      if (imts > 0) println(s"  inMemoryScans: $imts")
      SparkEntry.resetSessionState(spark)
    }
    spark.stop()
  }
}
