package graft.sources

import org.apache.spark.sql.SparkSession

/** DML candidate-selection probe: what does it cost to pick the files a
  * narrow DELETE/UPDATE/MERGE touches on a big table? The row-level
  * scan's old recipe filtered the GLOBAL snapshot layout (streams the
  * whole O(files) entry section, holds the full parsed layout on the
  * driver); the new one rides the selective seek path
  * ([[VersionedTable.selectiveCandidates]]). Both are
  * timed here on the same synthetic single-commit indexed manifests
  * (PlanLatencyProbe's fixture shape — planning never opens data
  * files), cold (fresh JVM memo state per decade, distinct tables) and
  * warm (repeat selections), with identical candidate sets asserted.
  *
  * Usage: `sbt "runMain graft.sources.DmlPlanProbe [iters] [decades]"`.
  */
object DmlPlanProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(7)
    val decadesArg = args.lift(1).map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(100000, 1000000))
    val root = java.nio.file.Files.createTempDirectory("graft_dmlplan").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))

    def mkTable(name: String, nFiles: Int): String = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      val carrier = dir.resolve("data").resolve("c1_probe")
      java.nio.file.Files.createDirectories(carrier)
      new GraftDataWriter(
        carrier.resolve("a-schema.parquet").toString, probeSchema).commit()
      val entries = (0 until nFiles).map { i =>
        val lo = i.toLong * 1000L
        s"data/c1_probe/part-$i.parquet#1000#k=$lo..${lo + 999}#k=1000"
      } :+ "data/c1_probe/a-schema.parquet#0"
      val (body, idxLines) =
        VersionedTable.indexedEntryLayout(entries)
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}",
        s"total=${entries.size}",
        s"rollup=c1_probe k=0..${nFiles.toLong * 1000L - 1L}",
        s"schema=c1_probe ${probeSchema.json}") ++ idxLines
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      dir.toString
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    // the old recipe, reproduced for the A side. The zero-row schema
    // carrier is excluded from the comparison: the old filter kept it
    // (no stats → cannot-exclude), the selective path's chunk cells
    // drop it (cells cover only row-carrying files) — a 0-row file is
    // candidate-irrelevant either way (nothing to rewrite).
    def oldCandidates(t: String, lo: Long, hi: Long): Int =
      VersionedTable.snapshotLayout(t, None).count {
        case (path, _, _, stats) =>
          !path.contains("a-schema") &&
            stats.get("k").forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    def newCandidates(t: String, lo: Long, hi: Long): Int =
      VersionedTable.selectiveCandidates(
        t, None, Map("k" -> (lo, hi)), Map.empty).size

    // class-load / JIT warmup on a throwaway table
    val w = mkTable("warmup", 1000)
    (1 to 3).foreach { _ =>
      oldCandidates(w, 1000L, 2000L); newCandidates(w, 1000L, 2000L)
    }

    val results = decadesArg.map { n =>
      val mid = n.toLong * 1000L / 2
      def time(body: => Int): (Double, Int) = {
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e6, r)
      }
      // separate tables per path so each COLD pays its own walk
      val tOld = mkTable(s"dml_old_$n", n)
      val (oldCold, cOld) = time(oldCandidates(tOld, mid, mid + 5000L))
      val oldWarm = (1 to iters).map(_ => time(oldCandidates(tOld, mid, mid + 5000L))._1)
      val tNew = mkTable(s"dml_new_$n", n)
      val (newCold, cNew) = time(newCandidates(tNew, mid, mid + 5000L))
      val newWarm = (1 to iters).map(_ => time(newCandidates(tNew, mid, mid + 5000L))._1)
      require(cOld == cNew, s"candidate sets differ: $cOld vs $cNew")
      (n, cNew, oldCold, median(oldWarm), newCold, median(newWarm))
    }
    val json = results.map { case (n, c, oc, ow, nc, nw) =>
      f"""{"files":$n,"candidates":$c,"old_cold_ms":$oc%.1f,"old_warm_ms":$ow%.1f,""" +
        f""""selective_cold_ms":$nc%.1f,"selective_warm_ms":$nw%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"dml_candidate_selection","iters":$iters,"rows":$json}""")
    spark.stop()
  }
}
