package graft

import org.apache.spark.sql.SparkSession

/** PLANNING-latency decade probe: how long does the catalog take to PLAN
  * (not execute) a selective query as the manifest grows 1k → 10k → 100k
  * file entries? Round 13 made file planning richer (zone parse, TopN
  * file selection, runtime pruning, row-group predicate build); this
  * measures what that costs at manifest scale. Manifests are synthetic
  * (self-contained version 1, one entry per fake file with footer count,
  * zone map, and NN segments) — planning never opens a data file, so the
  * files' absence is exactly the point: any fs access at plan time would
  * fail loudly here.
  *
  * Reports per decade: cold (first plan: manifest parse + resolve) and
  * warm (repeat plans: the per-query pruning walk) medians, in ms.
  *
  * Usage: `sbt "runMain graft.PlanLatencyProbe [iters]"`.
  */
object PlanLatencyProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(7)
    val decadesArg = args.lift(1).map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000, 10000, 100000))
    val root = java.nio.file.Files.createTempDirectory("graft_plan_probe").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      // the membership rows need PushMembershipProbes injected — the
      // same extension production sessions run with
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gpl", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gpl.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the (nullable, like every served schema) probe-table schema — its
    // json rides the persisted schema= header like real manifests carry
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))

    // the REAL publish-time index segment (per-dir runs, per-CHUNK
    // lines with rollup cells past the chunk threshold) — the fixtures
    // carry exactly what production manifests carry
    def indexedLayout(entries: Seq[String]): (Seq[String], Seq[String]) =
      graft.sources.VersionedTable.indexedEntryLayout(entries)

    def mkTable(name: String, nFiles: Int, indexed: Boolean): Unit = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      // one schema-carrier real file so footer fallbacks keep working
      val carrier = dir.resolve("data").resolve("c1_probe")
      java.nio.file.Files.createDirectories(carrier)
      // named to sort FIRST in the commit: snapshotSchema reads one
      // representative footer per commit — the min path — and only the
      // carrier actually exists on disk
      new graft.sources.GraftDataWriter(
        carrier.resolve("a-schema.parquet").toString, probeSchema).commit()
      val entries = (0 until nFiles).map { i =>
        val lo = i.toLong * 1000L
        val hi = lo + 999L
        s"data/c1_probe/part-$i.parquet#1000#k=$lo..$hi#k=1000"
      } :+ "data/c1_probe/a-schema.parquet#0"
      // post-upgrade manifests persist per-commit rollup + schema hints
      val (body, idxLines) =
        if (indexed) indexedLayout(entries) else (entries, Nil)
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}",
        s"rollup=c1_probe k=0..${nFiles.toLong * 1000L - 1L}",
        s"schema=c1_probe ${probeSchema.json}") ++
        (if (indexed) s"total=${entries.size}" +: idxLines else Nil)
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      ()
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

    // JVM/class-load warmup on a throwaway table so the first measured
    // cold is manifest work, not interpreter work
    mkTable("warmup", 200, indexed = true)
    (1 to 5).foreach { _ =>
      spark.sql("SELECT k FROM gpl.default.warmup WHERE k BETWEEN 1 AND 5")
        .queryExecution.executedPlan.toString
      // membership-rule path warms too (probe option encode + scan):
      // bloomless table, so it exercises classes, not pruning
      spark.sql("SELECT k FROM gpl.default.warmup " +
        "WHERE array_contains(array(v), 'x')")
        .queryExecution.executedPlan.toString
    }

    val results = decadesArg.flatMap { n =>
      Seq(false, true).map { indexed =>
        val name = if (indexed) s"pli_$n" else s"pl_$n"
        mkTable(name, n, indexed)
        val mid = n.toLong * 1000L / 2
        def planOnce(): Double = {
          val t0 = System.nanoTime()
          val desc = spark.sql(
            s"SELECT k FROM gpl.default.$name WHERE k BETWEEN $mid AND ${mid + 5000}")
            .queryExecution.executedPlan.toString
          require(desc.contains("files="), s"no catalog scan in:\n$desc")
          (System.nanoTime() - t0) / 1e6
        }
        val cold = planOnce() // manifest parse + resolve + first prune
        (1 to 3).foreach(_ => planOnce()) // JIT/codegen warmup
        val warm = (1 to iters).map(_ => planOnce())
        (n, indexed, cold, median(warm))
      }
    }
    val json = results.map { case (n, indexed, cold, warm) =>
      f"""{"files":$n,"indexed":$indexed,"cold_plan_ms":$cold%.1f,"warm_plan_ms":$warm%.1f}"""
    }.mkString("[", ",", "]")

    // THE INGEST SHAPE: the same file count split across many commits
    // with disjoint key ranges — real tables grow by appends, not one
    // giant commit. The commit-level zone rollup (two-level interval
    // index) should collapse the selective warm walk to ~O(commits) +
    // the matching commit's files; the single-commit fixture above is
    // the control (its one rollup interval spans everything).
    def mkMulti(name: String, nFiles: Int, perCommit: Int,
        indexed: Boolean): Unit = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      val nCommits = nFiles / perCommit
      val entries = (1 to nCommits).flatMap { j =>
        val cdir = dir.resolve("data").resolve(s"c${j}_probe")
        java.nio.file.Files.createDirectories(cdir)
        new graft.sources.GraftDataWriter(
          cdir.resolve("a-schema.parquet").toString, probeSchema).commit()
        (0 until perCommit).map { i =>
          val g = (j - 1).toLong * perCommit + i
          val lo = g * 1000L
          s"data/c${j}_probe/part-$i.parquet#1000#k=$lo..${lo + 999}#k=1000"
        } :+ s"data/c${j}_probe/a-schema.parquet#0"
      }
      // one persisted rollup + schema hint per commit, like tryPublish
      val hints = (1 to nCommits).flatMap { j =>
        val lo = (j - 1).toLong * perCommit * 1000L
        val hi = j.toLong * perCommit * 1000L - 1L
        Seq(s"rollup=c${j}_probe k=$lo..$hi",
          s"schema=c${j}_probe ${probeSchema.json}")
      }
      val (body, idxLines) =
        if (indexed) indexedLayout(entries) else (entries, Nil)
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}") ++
        hints ++
        (if (indexed) s"total=${entries.size}" +: idxLines else Nil)
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      ()
    }
    val multi = decadesArg.filter(_ >= 10000).flatMap { n =>
      Seq(false, true).map { indexed =>
        val perCommit = 100
        val name = if (indexed) s"plmi_$n" else s"plm_$n"
        mkMulti(name, n, perCommit, indexed)
        val mid = n.toLong * 1000L / 2
        def planOnce(): Double = {
          val t0 = System.nanoTime()
          val desc = spark.sql(
            s"SELECT k FROM gpl.default.$name WHERE k BETWEEN $mid AND ${mid + 5000}")
            .queryExecution.executedPlan.toString
          require(desc.contains("files="), s"no catalog scan in:\n$desc")
          (System.nanoTime() - t0) / 1e6
        }
        val hits0 = graft.sources.VersionedTable.selectiveSeekHits.get()
        val cold = planOnce()
        val seek = graft.sources.VersionedTable.selectiveSeekHits.get() > hits0
        (1 to 3).foreach(_ => planOnce())
        val warm = (1 to iters).map(_ => planOnce())
        (n, n / perCommit, indexed, seek, cold, median(warm))
      }
    }
    val multiJson = multi.map { case (n, c, indexed, seek, cold, warm) =>
      f"""{"files":$n,"commits":$c,"indexed":$indexed,"seek_path":$seek,""" +
        f""""cold_plan_ms":$cold%.1f,"warm_plan_ms":$warm%.1f}"""
    }.mkString("[", ",", "]")

    // STRING-bounded selective plans over ONE giant commit: the `s~`
    // chunk/rollup cells are the only thing standing between a
    // `sk BETWEEN 'a' AND 'b'` cold plan and streaming the O(files)
    // entry section — integral keys got this in round 17, this row
    // proves the string twin carries the same shape
    val strSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sk",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def mkStrTable(name: String, nFiles: Int, indexed: Boolean): Unit = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      val carrier = dir.resolve("data").resolve("c1_probe")
      java.nio.file.Files.createDirectories(carrier)
      new graft.sources.GraftDataWriter(
        carrier.resolve("a-schema.parquet").toString, strSchema).commit()
      val enc = java.util.Base64.getEncoder.withoutPadding
      def skOf(g: Long): String = f"s$g%010d"
      val entries = (0 until nFiles).map { i =>
        val lo = enc.encodeToString(skOf(i.toLong * 1000L).getBytes("UTF-8"))
        val hi = enc.encodeToString(
          skOf(i.toLong * 1000L + 999L).getBytes("UTF-8"))
        s"data/c1_probe/part-$i.parquet#1000@0###sk=$lo..$hi"
      } :+ "data/c1_probe/a-schema.parquet#0"
      val (body, idxLines) =
        if (indexed) indexedLayout(entries) else (entries, Nil)
      val rollLo = enc.encodeToString(skOf(0L).getBytes("UTF-8"))
      val rollHi = enc.encodeToString(
        skOf(nFiles.toLong * 1000L - 1L).getBytes("UTF-8"))
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}",
        s"rollup=c1_probe s~sk=$rollLo..$rollHi",
        s"schema=c1_probe ${strSchema.json}") ++
        (if (indexed) s"total=${entries.size}" +: idxLines else Nil)
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      ()
    }
    val strSel = decadesArg.flatMap { n =>
      Seq(false, true).map { indexed =>
        val name = if (indexed) s"plsi_$n" else s"pls_$n"
        mkStrTable(name, n, indexed)
        val mid = n.toLong * 1000L / 2
        def planOnce(): Double = {
          val t0 = System.nanoTime()
          val desc = spark.sql(
            s"SELECT sk FROM gpl.default.$name WHERE sk BETWEEN " +
              f"'s$mid%010d' AND 's${mid + 5000}%010d'")
            .queryExecution.executedPlan.toString
          require(desc.contains("files="), s"no catalog scan in:\n$desc")
          (System.nanoTime() - t0) / 1e6
        }
        val hits0 = graft.sources.VersionedTable.selectiveSeekHits.get()
        val cold = planOnce()
        val seek = graft.sources.VersionedTable.selectiveSeekHits.get() > hits0
        (1 to 3).foreach(_ => planOnce())
        val warm = (1 to iters).map(_ => planOnce())
        (n, indexed, seek, cold, median(warm))
      }
    }
    val strJson = strSel.map { case (n, indexed, seek, cold, warm) =>
      f"""{"files":$n,"indexed":$indexed,"seek_path":$seek,""" +
        f""""cold_plan_ms":$cold%.1f,"warm_plan_ms":$warm%.1f}"""
    }.mkString("[", ",", "]")

    // MEMBER-PROBE-only selective plans over ONE giant commit: the `b~`
    // chunk/rollup OR-union bloom cells are what stands between a cold
    // `array_contains(tags, 'g500')` plan and (a) streaming the O(files)
    // entry section AND (b) materializing the global O(files)×1 KiB
    // bloom map on the driver — the round-18 carve-out. Non-indexed
    // rows are the legacy-path control. Tag layout: one tag per run of
    // 100 files, so the probe survives exactly one chunk.
    val memSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tags",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    def tagBloom(tag: String): Array[Byte] = {
      val b = new Array[Byte](graft.functions.MemberBloom.DefaultBits / 8)
      graft.functions.MemberBloom.set(b,
        graft.functions.MemberBloom.hashUtf8(
          org.apache.spark.unsafe.types.UTF8String.fromString(tag)))
      b
    }
    def mkMemberTable(name: String, nFiles: Int, indexed: Boolean): Unit = {
      val dir = java.nio.file.Paths.get(root, "default", name)
      java.nio.file.Files.createDirectories(dir.resolve("_manifest"))
      java.nio.file.Files.createDirectories(dir.resolve("data"))
      val carrier = dir.resolve("data").resolve("c1_probe")
      java.nio.file.Files.createDirectories(carrier)
      new graft.sources.GraftDataWriter(
        carrier.resolve("a-schema.parquet").toString, memSchema).commit()
      val enc = java.util.Base64.getEncoder.withoutPadding
      // one bloom per 100-file tag group, base64 memoized once
      val groupB64 = (0 until (nFiles + 99) / 100)
        .map(g => enc.encodeToString(tagBloom(s"g$g")))
      val entries = (0 until nFiles).map { i =>
        s"data/c1_probe/part-$i.parquet#1000@0####tags=${groupB64(i / 100)}"
      } :+ "data/c1_probe/a-schema.parquet#0"
      val (body, idxLines) =
        if (indexed) indexedLayout(entries) else (entries, Nil)
      // commit-level b~ cell: OR of every group bloom (realistic — a
      // giant commit's union excludes nothing; CHUNK cells do the work)
      val all = new Array[Byte](graft.functions.MemberBloom.DefaultBits / 8)
      (0 until (nFiles + 99) / 100).foreach { g =>
        val b = tagBloom(s"g$g")
        var i = 0
        while (i < all.length) { all(i) = (all(i) | b(i)).toByte; i += 1 }
      }
      val header = Seq("version=1", s"ts=${System.currentTimeMillis()}",
        s"rollup=c1_probe b~tags=${enc.encodeToString(all)}",
        s"schema=c1_probe ${memSchema.json}") ++
        (if (indexed) s"total=${entries.size}" +: idxLines else Nil)
      java.nio.file.Files.write(
        dir.resolve("_manifest").resolve("1.manifest"),
        ((header ++ body).mkString("\n") + "\n").getBytes)
      ()
    }
    // first-touch warmup for the membership path (bloom parse, probe
    // encode, base64 JIT) so the measured colds are manifest work
    mkMemberTable("mwarm", 500, indexed = true)
    (1 to 3).foreach { _ =>
      spark.sql(
        "SELECT id FROM gpl.default.mwarm WHERE array_contains(tags, 'g1')")
        .queryExecution.executedPlan.toString
    }
    val memSel = decadesArg.flatMap { n =>
      Seq(false, true).map { indexed =>
        val name = if (indexed) s"plbi_$n" else s"plb_$n"
        mkMemberTable(name, n, indexed)
        val tag = s"g${n / 200}" // the mid group
        def planOnce(): Double = {
          val t0 = System.nanoTime()
          val desc = spark.sql(
            s"SELECT id FROM gpl.default.$name " +
              s"WHERE array_contains(tags, '$tag')")
            .queryExecution.executedPlan.toString
          require(desc.contains("files="), s"no catalog scan in:\n$desc")
          (System.nanoTime() - t0) / 1e6
        }
        val hits0 = graft.sources.VersionedTable.selectiveSeekHits.get()
        val cold = planOnce()
        val seek = graft.sources.VersionedTable.selectiveSeekHits.get() > hits0
        (1 to 3).foreach(_ => planOnce())
        val warm = (1 to iters).map(_ => planOnce())
        (n, indexed, seek, cold, median(warm))
      }
    }
    val memJson = memSel.map { case (n, indexed, seek, cold, warm) =>
      f"""{"files":$n,"indexed":$indexed,"seek_path":$seek,""" +
        f""""cold_plan_ms":$cold%.1f,"warm_plan_ms":$warm%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"plan_latency_decades","iters":$iters,"decades":$json,"multi_commit":$multiJson,"str_selective":$strJson,"member_selective":$memJson}""")
    spark.stop()
  }
}
