package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (Test / fork := true in
  * build.sbt ⇒ all suites share a single forked JVM). UTC + 8 shuffle
  * partitions keep tests deterministic and fast.
  */
object SparkTestBase {

  /** Temp directory for a test, deleted RECURSIVELY at JVM exit —
    * `File.deleteOnExit` only removes empty directories, which silently
    * leaks every populated fixture dir (the bucketedJoin leak class,
    * test edition: 125 stale /tmp/graft_* dirs found from prior runs).
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      if (Files.exists(d)) {
        val walk = Files.walk(d)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    }))
    d
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-tests")
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
