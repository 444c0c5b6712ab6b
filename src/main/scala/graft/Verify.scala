package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Each query runs
  * under a timeout so one pathological plan degrades to a single missing
  * entry instead of hanging the whole correctness gate.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration convenience (absent in driver runs): restrict the
    // dumped query set, same contract as SPARK_GRAFT_BENCH_ONLY
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      Timeouts.run(spark, name, timeoutSec) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }.left.foreach(msg => System.err.println(s"[verify] $name failed: $msg"))
      // same between-query isolation as Bench: one query's caches /
      // checkpoint RDDs must not squeeze the next query's memory
      SparkEntry.resetSessionState(spark)
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.quote(k)}: ${Json.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

/** Per-query timeout shared by the Verify/Bench mains: runs the body on a
  * worker thread tagged with a Spark job group; on timeout the group's
  * jobs are cancelled so the executor slots free up for the next query.
  */
object Timeouts {
  def run(spark: SparkSession, tag: String, timeoutSec: Long)(body: => Unit): Either[String, Unit] = {
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val pool = Executors.newSingleThreadExecutor()
    val task = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
      }
    })
    try {
      task.get(timeoutSec, TimeUnit.SECONDS)
      Right(())
    } catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(tag)
        task.cancel(true)
        Left(s"timed out after ${timeoutSec}s (job group cancelled)")
      case e: java.util.concurrent.ExecutionException =>
        val cause = Option(e.getCause).getOrElse(e)
        Left(String.valueOf(cause.getMessage))
    } finally pool.shutdownNow()
  }
}
