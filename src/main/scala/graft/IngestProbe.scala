package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** INGEST steady-state probe: a table that grows by appends is planned
  * after every batch — the loop is (append tiny commit, plan at the new
  * head), repeated forever. Appends themselves are O(fresh) by design
  * (carry pointers, `tryPublish`), but every NEW version is a fresh memo
  * key for the chain-walking planning memos (`persistedHeaders`,
  * `snapshotSchema`'s dir enumeration, the selective entry walk), so the
  * first plan after each append pays whatever those walks cost at the
  * current CHAIN LENGTH. This probe pins that number as the chain grows
  * 100 → 1k → 10k carry commits over a 100k-file base: per decade it
  * runs real `VersionedTable.commit(append = true)` calls with a tiny
  * DataFrame and times (a) the commit and (b) the first plan of the new
  * head, reporting medians.
  *
  * The pre-grown chain is synthesized in exactly `tryPublish`'s carry
  * format (version/ts/carry/delta headers, one rollup= + schema= hint
  * per commit, entry lines with zones) — planning never opens a
  * pre-grown data file, so their absence is the proof that no plan path
  * regressed into footer I/O. The measured appends are fully real.
  *
  * Usage: `sbt "runMain graft.IngestProbe [iters] [chains] [baseFiles]"`.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(9)
    val chains = args.lift(1).map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(100, 1000, 10000))
    val baseFiles = args.lift(2).map(_.toInt).getOrElse(100000)
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gip", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gip.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))

    /** Base (version 1, indexed, self-contained) + `nCarry` synthetic
      * carry commits (versions 2..nCarry+1), each one fresh data file
      * with its own rollup + schema hint — the shape `tryPublish`
      * produces for an append.
      */
    def mkChainTable(name: String, nBase: Int, nCarry: Int): Unit = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      // one real schema-carrier file so any footer fallback works (and
      // fails loudly nowhere): real appends below also write real files
      val carrier = dir.resolve("data").resolve("c1_probe")
      java.nio.file.Files.createDirectories(carrier)
      new graft.sources.GraftDataWriter(
        carrier.resolve("a-schema.parquet").toString, probeSchema).commit()
      val entries = (0 until nBase).map { i =>
        val lo = i.toLong * 1000L
        s"data/c1_probe/part-$i.parquet#1000#k=$lo..${lo + 999}#k=1000"
      } :+ "data/c1_probe/a-schema.parquet#0"
      val (body, idxLines) =
        graft.sources.VersionedTable.indexedEntryLayout(entries)
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}",
        s"total=${entries.size}",
        s"rollup=c1_probe k=0..${nBase.toLong * 1000L - 1L}",
        s"schema=c1_probe ${probeSchema.json}") ++ idxLines
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      // the carry chain: each version j adds commit dir c<j>_pre with
      // one file keyed far above the base range
      (2 to nCarry + 1).foreach { j =>
        val lo = 1000000000L + j.toLong * 1000L
        val e = s"data/c${j}_pre/part-0.parquet#1000#k=$lo..${lo + 999}#k=1000"
        val header = Seq(s"version=$j", s"ts=${System.currentTimeMillis()}",
          s"carry=${j - 1}", "delta=1 0",
          s"rollup=c${j}_pre k=$lo..${lo + 999}",
          s"schema=c${j}_pre ${probeSchema.json}")
        java.nio.file.Files.write(
          dir.resolve("_manifest").resolve(s"$j.manifest"),
          ((header :+ e).mkString("\n") + "\n").getBytes)
      }
      ()
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    // JVM warmup on a short chain
    mkChainTable("warmup", 1000, 20)
    (1 to 3).foreach { i =>
      val df = spark.range(10).select(
        (col("id") + lit(2000000000L + i * 100L)).as("k"),
        concat(lit("w"), col("id")).as("v"))
      graft.sources.VersionedTable.commit(
        df, s"$root/default/warmup", append = true)
      spark.sql(
        "SELECT k FROM gip.default.warmup WHERE k BETWEEN 500000 AND 505000")
        .queryExecution.executedPlan.toString
    }

    val results = chains.map { c =>
      val name = s"ing_$c"
      mkChainTable(name, baseFiles, c)
      val mid = baseFiles.toLong * 1000L / 2
      var appendKey = 3000000000L
      def appendOnce(): Double = {
        val df = spark.range(10).select(
          (col("id") + lit(appendKey)).as("k"),
          concat(lit("a"), col("id")).as("v"))
        appendKey += 1000L
        val t0 = System.nanoTime()
        graft.sources.VersionedTable.commit(
          df, s"$root/default/$name", append = true)
        (System.nanoTime() - t0) / 1e6
      }
      def planOnce(): Double = {
        val t0 = System.nanoTime()
        val desc = spark.sql(
          s"SELECT k FROM gip.default.$name WHERE k BETWEEN $mid AND ${mid + 5000}")
          .queryExecution.executedPlan.toString
        require(desc.contains("files="), s"no catalog scan in:\n$desc")
        (System.nanoTime() - t0) / 1e6
      }
      // first touch: the cold chain walk over the pre-grown manifests
      val cold = planOnce()
      val pairs = (1 to iters).map { _ =>
        val ca = appendOnce()
        val pa = planOnce() // FIRST plan of the brand-new head version
        (ca, pa)
      }
      // steady-state replans of one head (no append in between): the
      // warm floor the post-append plan should be judged against —
      // with the head-listing cost of one replan broken out
      val c0 = graft.sources.VersionedTable.versionsCalls.get()
      val n0 = graft.sources.VersionedTable.versionsNanos.get()
      val warm = (1 to iters).map(_ => planOnce())
      val listCalls =
        (graft.sources.VersionedTable.versionsCalls.get() - c0) / iters
      val listMs =
        (graft.sources.VersionedTable.versionsNanos.get() - n0) / 1e6 / iters
      // CHECKPOINT: the metadata-only chain reset — time it, then show
      // what the ingest loop pays after it (the fold caches were
      // cleared by the materialization, so this re-plan re-seeds from
      // the now-chainless manifest)
      val tck0 = System.nanoTime()
      graft.sources.VersionedTable.checkpoint(s"$root/default/$name")
      val ckMs = (System.nanoTime() - tck0) / 1e6
      val postCk = (1 to iters).map { _ => appendOnce(); planOnce() }
      (c, cold, median(pairs.map(_._1)), median(pairs.map(_._2)),
        median(warm), listCalls, listMs, ckMs, median(postCk))
    }
    val json = results.map {
      case (c, cold, commitMs, planMs, warmMs, listCalls, listMs, ckMs, pckMs) =>
        f"""{"chain_commits":$c,"base_files":$baseFiles,""" +
          f""""cold_first_plan_ms":$cold%.1f,"append_commit_ms":$commitMs%.1f,""" +
          f""""plan_after_append_ms":$planMs%.1f,"replan_same_head_ms":$warmMs%.1f,""" +
          f""""version_listings_per_plan":$listCalls,"listing_ms_per_plan":$listMs%.1f,""" +
          f""""checkpoint_ms":$ckMs%.1f,"plan_after_append_post_checkpoint_ms":$pckMs%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"ingest_steady_state","iters":$iters,"rows":$json}""")
    spark.stop()
  }
}
