package graft

import graft.sources.VersionedTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** The versioned table as a Structured-Streaming SOURCE (`graft-table`):
  * commit versions are the offsets, so micro-batch planning is a pure
  * function of the checkpointed offset range — exactly-once without
  * file-listing heuristics. Pins: initial load + incremental appends
  * equal the batch twin (`appendsBetween`), checkpoint recovery resumes
  * at the committed version (no replay, no loss), and the
  * overwrite/delete commits fail the stream loudly (delete skippable by
  * option), mirroring the batch contract.
  */
class VersionedStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def freshDir(): String = SparkTestBase.tempDir("graft_vstream").toString

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v")
  }

  private def drainTo(table: String, sink: String, checkpoint: String): Unit = {
    val q = spark.readStream.format("graft-table").load(table)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  private def slurpSink(sink: String): Set[(Long, String, Long)] =
    spark.sql(s"SELECT * FROM $sink").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("streamed micro-batches equal the batch twin, stamped per commit") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 2L -> "b"), t, append = false)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    drainTo(t, "vstream_eq", s"$d/cp")
    val streamed = slurpSink("vstream_eq")
    assert(streamed == Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L)))
    // batch twin: same rows, same stamps
    val twin = VersionedTable.appendsBetween(spark, t, 0L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == twin)
  }

  test("NESTED tables stream: arrays/structs flow micro-batched, posdel skippable") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{expr, struct}
    val d = freshDir()
    val t = s"$d/nt"
    def mk(ks: Seq[Long]) = ks.map(k => (k, Seq(k, k * 2), (s"l$k", k.toInt)))
      .toDF("id", "toks", "meta")
      .withColumn("meta",
        struct(col("meta._1").as("lang"), col("meta._2").as("n")))
    VersionedTable.commit(mk(1L to 30L), t, append = false)
    VersionedTable.commit(mk(31L to 50L), t, append = true)
    // a positional deletion-vector commit sits mid-stream; the reader
    // skips it under ignoreDeletes and serves the append commits' rows
    VersionedTable.deleteWherePositional(spark, t, col("id") % 10L === 0L)
    VersionedTable.commit(mk(51L to 60L), t, append = true)
    val q = spark.readStream.format("graft-table")
      .option("ignoreDeletes", "true").load(t)
      .select(col("id"), expr("aggregate(toks, 0L, (a, x) -> a + x)").as("ts"),
        col("meta.lang").as("lang"), col("meta.n").as("n"))
      .writeStream.format("memory").queryName("vstream_nested")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM vstream_nested").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    // append-stream semantics: every appended row, nested values exact
    // (the posdel applies to SNAPSHOT reads, not the append feed)
    assert(got == (1L to 60L).map(k => (k, k * 3, s"l$k", k.toInt)).toSet,
      s"nested streamed values diverged (got ${got.size} rows)")
    // the batch snapshot DOES apply the vector — twin check of the read
    val snap = VersionedTable.read(spark, t)
      .select(col("id"), expr("aggregate(toks, 0L, (a, x) -> a + x)").as("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the vector binds to the files present at delete time: ids 10–50
    // are doomed, 60 arrived in the LATER append and survives
    assert(snap == (1L to 60L)
      .filterNot(k => k % 10 == 0 && k <= 50).map(k => (k, k * 3)).toSet)
  }

  test("streams serve logical names over a renamed table, in and out") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 2L -> "b"), t, append = false)
    VersionedTable.renameColumn(spark, t, "k", "key_id")
    // appends after the rename still land physically consistent
    VersionedTable.commit(
      { val s = spark; import s.implicits._
        Seq((3L, "c")).toDF("key_id", "v") }, t, append = true)
    drainTo(t, "vstream_renamed", s"$d/cp")
    val out = spark.sql("SELECT * FROM vstream_renamed")
    assert(out.columns.toSeq == Seq("key_id", "v", "_commit_version"),
      s"stream must report logical names: ${out.columns.toSeq}")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet == Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L)))
    // the native SINK writes physical names: stream the logical frame
    // into a clone-side table created under the same mapping
    val t2 = s"$d/t2"
    VersionedTable.cloneTable(t, t2, Some(1L))
    val q = spark.readStream.format("graft-table").load(t)
      .writeStream.format("graft-table").option("path", t2)
      .option("checkpointLocation", s"$d/cp2")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = VersionedTable.read(spark, t2).select("key_id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows == Seq(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b", 3L -> "c"),
      s"sink rows under mapping: $rows")
  }

  test("pushed filters prune each micro-batch's files through zone maps") {
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    // two range-clustered commits with zone maps: 8 files, disjoint key
    // ranges — a selective filter can only need ~1 of them
    VersionedTable.commit(
      (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(4, col("k")),
      t, append = false, statsCols = Seq("k"))
    VersionedTable.commit(
      (401L to 800L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(4, col("k")),
      t, append = true, statsCols = Seq("k"))
    val q = spark.readStream.format("graft-table").load(t)
      .filter(col("k") >= 100L && col("k") <= 120L)
      .writeStream.format("memory").queryName("vs_prune")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.sql("SELECT k FROM vs_prune").collect()
      .map(_.getLong(0)).sorted.toSeq == (100L to 120L),
      "pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"zone pruning must skip most files: read $inputRows of 800 rows")
    // a fresh unfiltered stream still reads everything
    val q2 = spark.readStream.format("graft-table").load(t)
      .writeStream.format("memory").queryName("vs_noprune")
      .option("checkpointLocation", s"$d/cp2")
      .start()
    try q2.processAllAvailable()
    finally q2.stop()
    assert(spark.sql("SELECT count(*) FROM vs_noprune")
      .collect()(0).getLong(0) == 800L)
  }

  test("membership probes prune each micro-batch's files through member blooms") {
    val s = spark; import s.implicits._
    val d = freshDir()
    // member blooms come from table props — create through the catalog,
    // stream from the table's path (the same files either way)
    spark.conf.set("spark.sql.catalog.gvsm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvsm.root", d)
    spark.sql(
      """CREATE TABLE gvsm.default.mt (
        |  id BIGINT, tags ARRAY<STRING>)
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    Seq("en", "de", "fr", "zh").zipWithIndex.foreach { case (tag, i) =>
      spark.sql(
        s"""INSERT INTO gvsm.default.mt
           |SELECT id + ${i * 100}, array('$tag')
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    val t = s"$d/default/mt"
    val q = spark.readStream.format("graft-table").load(t)
      .filter(org.apache.spark.sql.functions.array_contains(col("tags"), "de"))
      .writeStream.format("memory").queryName("vs_member")
      .option("checkpointLocation", s"$d/cp_m")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.sql("SELECT id FROM vs_member").collect()
      .map(_.getLong(0)).sorted.toSeq == (100L until 200L),
      "membership pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows <= 100L,
      s"member blooms must skip the other languages' files: read $inputRows of 400 rows")
    // disjunctive group: two tags admit exactly two files' rows
    val q2 = spark.readStream.format("graft-table").load(t)
      .filter(org.apache.spark.sql.functions.arrays_overlap(col("tags"),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("en"),
          org.apache.spark.sql.functions.lit("zh"))))
      .writeStream.format("memory").queryName("vs_member_ovl")
      .option("checkpointLocation", s"$d/cp_m2")
      .start()
    try q2.processAllAvailable()
    finally q2.stop()
    val got = spark.sql("SELECT id FROM vs_member_ovl").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 100L) ++ (300L until 400L)),
      s"overlap group must keep both matching generations: ${got.size} rows")
    val inputRows2 = q2.recentProgress.map(_.numInputRows).sum
    assert(inputRows2 <= 200L,
      s"the two-key group must admit two files: read $inputRows2 of 400 rows")
  }

  test("a stream consumed by several filtered branches never loses rows to pruning") {
    // regression: one micro-batch plan, one VersionedMicroBatchStream,
    // TWO Filter parents (union of disjoint key ranges). Last-writer-wins
    // pushdown would zone-prune the batch's files with only one branch's
    // bounds and silently drop the other branch's rows. The rule must
    // push bounds only for a single-consumer stream.
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      (1L to 800L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(8, col("k")),
      t, append = false, statsCols = Seq("k"))
    val src = spark.readStream.format("graft-table").load(t)
    val lo = src.filter(col("k") >= 10L && col("k") <= 20L)
    val hi = src.filter(col("k") >= 700L && col("k") <= 710L)
    val q = lo.union(hi)
      .writeStream.format("memory").queryName("vs_shared")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT k FROM vs_shared").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((10L to 20L) ++ (700L to 710L)),
      s"shared-stream union must keep BOTH branches' rows: got ${got.size} rows")
  }

  test("a stream joined to a small dimension prunes fresh files by the join keys") {
    // the streaming twin of the batch scan's runtime (DPP-style) In
    // filters: the rule executes the small dimension's key projection
    // per micro-batch and hands the observed keys to the stream, so
    // planInputPartitions skips fresh files whose zones hold none
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      (1L to 800L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(8, col("k")),
      t, append = false, statsCols = Seq("k"))
    val dim = Seq((105L, "a"), (110L, "b")).toDF("dk", "tag")
    val src = spark.readStream.format("graft-table").load(t)
    val q = src.join(dim, src("k") === dim("dk"))
      .writeStream.format("memory").queryName("vs_dimjoin")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT k, tag FROM vs_dimjoin ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((105L, "a"), (110L, "b")),
      "join pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"join-key pruning must skip most files: read $inputRows of 800 rows")
    // an ANTI join keeps exactly the NON-matching stream rows — the rule
    // must push nothing (pruning by dim keys would be unsound), and the
    // result proves it: all 798 non-matching rows survive
    val q2 = src.join(dim, src("k") === dim("dk"), "left_anti")
      .writeStream.format("memory").queryName("vs_dimanti")
      .option("checkpointLocation", s"$d/cp2")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.sql("SELECT count(*) FROM vs_dimanti")
      .collect()(0).getLong(0) == 798L,
      "anti join must read everything — no join-key pruning")
    assert(q2.recentProgress.map(_.numInputRows).sum == 800L)
  }

  test("a stream joined on a NESTED struct leaf prunes fresh files (dotted key sets)") {
    // runtime join-key pruning when the stream-side key is a struct
    // LEAF (meta.lang): the rule renders the GetStructField chain as
    // the dotted name the zone maps record, and the per-batch file
    // probe consumes it through the same string In-set path — batch
    // got dotted zone keys in round 17, the stream now matches
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    val langs = Array("ar", "de", "en", "es", "fr", "ja", "pt", "zh")
    VersionedTable.commit(
      (1L to 800L).map(k => (k, langs(((k - 1) / 100L).toInt), k % 50L))
        .toDF("k", "lang", "n")
        .select(col("k"),
          org.apache.spark.sql.functions.struct(
            col("lang"), col("n")).as("meta"))
        .repartitionByRange(8, col("meta.lang")),
      t, append = false, statsCols = Seq("meta.lang"))
    val dim = Seq(("en", "english"), ("fr", "french")).toDF("dlang", "tag")
    val src = spark.readStream.format("graft-table").load(t)
    val q = src.join(dim, src("meta.lang") === dim("dlang"))
      .select(col("k"), col("tag"))
      .writeStream.format("memory").queryName("vs_nestjoin")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql(
      "SELECT tag, count(*) AS c FROM vs_nestjoin GROUP BY tag ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("english", 100L), ("french", 100L)),
      "nested-key join pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"nested join-key pruning must skip most files: read $inputRows of 800 rows")
  }

  test("a stream joined to a DATE dimension prunes fresh files (epoch-day key sets)") {
    // runtime join-key pruning for temporal dimension keys: the rule
    // converts the dimension's DATE keys to epoch days at collection —
    // the exact unit the date zone maps record — so a stream clustered
    // on a date column skips fresh files per micro-batch
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      (1L to 800L).map(k => (k, java.sql.Date.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(k)))).toDF("k", "dt")
        .repartitionByRange(8, col("dt")),
      t, append = false, statsCols = Seq("dt"))
    val dim = Seq(
      (java.sql.Date.valueOf("2020-04-15"), "a"),  // day 105
      (java.sql.Date.valueOf("2020-04-20"), "b"))  // day 110
      .toDF("ddt", "tag")
    val src = spark.readStream.format("graft-table").load(t)
    val q = src.join(dim, src("dt") === dim("ddt"))
      .writeStream.format("memory").queryName("vs_datejoin")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT k, tag FROM vs_datejoin ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((105L, "a"), (110L, "b")),
      "date join pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"date join-key pruning must skip most files: read $inputRows of 800 rows")
  }

  test("a stream joined to a DOUBLE dimension prunes fresh files (sortable-bits bounds)") {
    // runtime join-key pruning for floating keys: dimension doubles ride
    // as boxed values and the pushed In converts them to SORTABLE BITS
    // under the tilde zone key — a stream clustered on a double column
    // skips the fresh files outside the keys' range
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      (1L to 800L).map(k => (k, k + 0.25)).toDF("k", "price")
        .repartitionByRange(8, col("price")),
      t, append = false, statsCols = Seq("price"))
    val dim = Seq((105.25d, "a"), (110.25d, "b")).toDF("dprice", "tag")
    val src = spark.readStream.format("graft-table").load(t)
    val q = src.join(dim, src("price") === dim("dprice"))
      .writeStream.format("memory").queryName("vs_dbljoin")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT k, tag FROM vs_dbljoin ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((105L, "a"), (110L, "b")),
      "double join pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"double join-key pruning must skip most files: read $inputRows of 800 rows")
  }

  test("a stream joined to a DECIMAL dimension prunes fresh files (unscaled key sets)") {
    val s = spark; import s.implicits._
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      (1L to 800L).map(k => (k, k)).toDF("k", "price")
        .withColumn("price", col("price").cast("decimal(9,2)"))
        .repartitionByRange(8, col("price")),
      t, append = false, statsCols = Seq("price"))
    val dim = Seq((BigDecimal("105.00"), "a"), (BigDecimal("110.00"), "b"))
      .toDF("dp", "tag")
      .withColumn("dp", col("dp").cast("decimal(9,2)"))
    val src = spark.readStream.format("graft-table").load(t)
    val q = src.join(dim, src("price") === dim("dp"))
      .writeStream.format("memory").queryName("vs_decjoin")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT k, tag FROM vs_decjoin ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((105L, "a"), (110L, "b")),
      "decimal join pruning must never change results")
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows < 400L,
      s"decimal join-key pruning must skip most files: read $inputRows of 800 rows")
  }

  test("checkpoint recovery resumes at the committed version: no replay, no loss") {
    val d = freshDir()
    val t = s"$d/t"
    // memory sinks can't recover a checkpoint; a parquet sink can — and
    // it makes replay visible as duplicate rows, which is the assertion
    def drainToFiles(): Unit = {
      val q = spark.readStream.format("graft-table").load(t)
        .writeStream.format("parquet")
        .option("path", s"$d/sink")
        .option("checkpointLocation", s"$d/cp")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.commit(df(1L -> "a"), t, append = false)
    drainToFiles()
    // two appends while the stream is DOWN; restart from the checkpoint
    VersionedTable.commit(df(2L -> "b"), t, append = true)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    drainToFiles()
    val rows = spark.read.parquet(s"$d/sink").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(rows == Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)),
      s"recovered stream must emit exactly the unseen commits once, got $rows")
  }

  test("maxVersionsPerTrigger bounds each micro-batch; pruned projection still correct") {
    val d = freshDir()
    val t = s"$d/t"
    (1L to 5L).foreach(i =>
      VersionedTable.commit(df(i -> s"v$i"), t, append = i > 1L))
    // one commit per trigger: catching up over 5 commits takes ≥5 batches —
    // and a pruned, reordered projection (no _commit_version, v before k)
    // must decode only what it emits
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", "1").load(t)
      .select(col("v"), col("k"))
      .writeStream.format("memory").queryName("vstream_rate")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql("SELECT * FROM vstream_rate").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == (1L to 5L).map(i => (s"v$i", i)).toSet)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      s"expected ≥5 rate-limited batches, saw " +
        q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("maxRowsPerTrigger bounds batches by manifest row counts, never splits a commit") {
    val d = freshDir()
    val t = s"$d/t"
    // commits of 3, 3, 3, 10, 3 rows: with maxRows=6 expect batches of
    // [v1,v2]=6, [v3]=3 (v4 won't fit), [v4]=10 (oversized, admitted
    // alone rather than stalling), [v5]=3
    VersionedTable.commit(df(1L -> "a", 2L -> "a", 3L -> "a"), t, append = false)
    VersionedTable.commit(df(4L -> "b", 5L -> "b", 6L -> "b"), t, append = true)
    VersionedTable.commit(df(7L -> "c", 8L -> "c", 9L -> "c"), t, append = true)
    VersionedTable.commit(
      df((10L to 19L).map(k => k -> "d"): _*), t, append = true)
    VersionedTable.commit(df(20L -> "e", 21L -> "e", 22L -> "e"), t, append = true)
    val q = spark.readStream.format("graft-table")
      .option("maxRowsPerTrigger", "6").load(t)
      .writeStream.format("memory").queryName("vstream_rows")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT count(*) FROM vstream_rows")
      .collect()(0).getLong(0) == 22L, "no loss, no replay")
    val batches = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).toSeq
    assert(batches == Seq(6L, 3L, 10L, 3L),
      s"expected row-bounded batches 6,3,10,3 — got ${batches.mkString(",")}")
  }

  test("maxBytesPerTrigger bounds batches by exact manifest bytes") {
    val d = freshDir()
    val t = s"$d/t"
    // five same-shaped commits of 100 rows each; a byte budget of ~2.5
    // files must admit exactly two commits per batch (a commit is never
    // split), from manifest arithmetic alone
    (0 until 5).foreach { i =>
      val s = spark; import s.implicits._
      VersionedTable.commit(
        (1L to 100L).map(k => (k + i * 100L, s"v$k")).toDF("k", "v"),
        t, append = i > 0)
    }
    val oneCommit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(t, "data")).iterator
        .asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(p => (p.toString.split("/data/")(1).split('/')(0),
          java.nio.file.Files.size(p)))
        .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).values.max
    }
    val q = spark.readStream.format("graft-table")
      .option("maxBytesPerTrigger", (oneCommit * 5 / 2).toString).load(t)
      .writeStream.format("memory").queryName("vstream_bytes")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT count(*) FROM vstream_bytes")
      .collect()(0).getLong(0) == 500L, "no loss, no replay")
    val batches = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).toSeq
    assert(batches == Seq(200L, 200L, 100L),
      s"expected byte-bounded batches 200,200,100 — got ${batches.mkString(",")}")
  }

  test("bronze→silver: streaming table-to-table pipeline is exactly-once end to end") {
    val d = freshDir()
    val bronze = s"$d/bronze"
    val silver = s"$d/silver"
    // the medallion shape: a raw table consumed incrementally, transformed,
    // and committed into a refined table — exactly-once on BOTH ends
    // (version offsets on the read, txn-id idempotent commits on the write)
    def refine(): Unit = {
      val q = spark.readStream.format("graft-table").load(bronze)
        .filter(col("v") =!= "junk")
        .writeStream
        .option("checkpointLocation", s"$d/cp")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          VersionedTable.commitIfAbsent(
            batch.select("k", "v"), silver, append = true, txnId = s"b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.commit(df(1L -> "a", 2L -> "junk"), bronze, append = false)
    refine()
    VersionedTable.commit(df(3L -> "c"), bronze, append = true)
    refine() // restart from checkpoint: only the new bronze commit flows
    val got = VersionedTable.read(spark, silver).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(1L -> "a", 3L -> "c"),
      s"silver must hold each refined row exactly once, got $got")
    // and the silver history shows one append per non-empty micro-batch,
    // each carrying its batch txn id
    val ops = VersionedTable.history(spark, silver).collect()
      .map(r => (r.getString(1), r.getString(5) != null)).toSeq
    assert(ops.forall { case (op, hasTxn) => (op == "create" || op == "append") && hasTxn })
  }

  test("native streaming sink: table-to-table pipeline with epoch-txn exactly-once") {
    val d = freshDir()
    val bronze = s"$d/bronze"
    val silver = s"$d/silver"
    // the medallion pipeline with ZERO foreachBatch boilerplate:
    // graft-table source → transform → graft-table sink
    def refine(): Unit = {
      val q = spark.readStream.format("graft-table").load(bronze)
        .filter(col("v") =!= "junk")
        .select("k", "v")
        .writeStream.format("graft-table")
        .option("path", silver)
        .option("checkpointLocation", s"$d/cp")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.commit(df(1L -> "a", 2L -> "junk"), bronze, append = false)
    refine()
    VersionedTable.commit(df(3L -> "c"), bronze, append = true)
    refine() // restart from checkpoint: only the new bronze commit flows
    val got = VersionedTable.read(spark, silver).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(1L -> "a", 3L -> "c"),
      s"silver must hold each refined row exactly once, got $got")
    // every silver commit carries its epoch txn id; no staging residue
    val h = VersionedTable.history(spark, silver).collect()
    assert(h.forall(r => Option(r.getString(5)).exists(_.startsWith("stream:"))),
      "silver commits must be epoch-txn stamped")
    import scala.jdk.CollectionConverters._
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(silver, "data"))
      .iterator.asScala.map(_.getFileName.toString).toSeq
    assert(!dirs.exists(_.startsWith("_stg_")), s"staging residue: $dirs")
  }

  test("streaming into a BUCKETED sink table preserves the bucket layout") {
    val d = freshDir()
    val bronze = s"$d/bronzeb"
    val silver = s"$d/silverb"
    // seat the silver bucket layout before the stream ever writes
    VersionedTable.commitBucketed(
      df(100L -> "seed"), silver, "k", 4, append = false)
    VersionedTable.commit(
      df(1L -> "a", 2L -> "b", 5L -> "c", 7L -> "d"), bronze, append = false)
    val q = spark.readStream.format("graft-table").load(bronze)
      .select("k", "v")
      .writeStream.format("graft-table")
      .option("path", silver)
      .option("checkpointLocation", s"$d/cpb")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = VersionedTable.read(spark, silver).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(1L -> "a", 2L -> "b", 5L -> "c", 7L -> "d", 100L -> "seed"))
    // on disk the streamed commit nests every file under its key's bucket
    import scala.jdk.CollectionConverters._
    val stray = java.nio.file.Files.walk(java.nio.file.Paths.get(silver, "data"))
      .iterator.asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet") &&
        !p.toString.contains("__graft_bucket=")).toSeq
    assert(stray.isEmpty, s"streamed commit wrote flat files: $stray")
    // and each streamed row sits in pmod(k, 4) specifically
    val misplaced = java.nio.file.Files.walk(java.nio.file.Paths.get(silver, "data"))
      .iterator.asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet")).flatMap { p =>
        val b = p.toString.split("__graft_bucket=")(1).split('/')(0).toInt
        spark.read.parquet(p.toString).collect().map(_.getLong(0))
          .filter(k => (k % 4).toInt != b).map(k => (k, b))
      }.toSeq
    assert(misplaced.isEmpty, s"rows outside their key's bucket: $misplaced")
  }

  test("change-feed mode streams tombstone commits as delete rows — equals the batch CDF twin") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 2L -> "b", 3L -> "c"), t, append = false)
    VersionedTable.deleteWhere(spark, t, col("k") === 2L, "k")
    VersionedTable.commit(df(4L -> "d"), t, append = true)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(t)
      .writeStream.format("memory").queryName("vstream_cdf")
      .option("checkpointLocation", s"$d/cp").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT k, _commit_version, _change_type FROM vstream_cdf")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == Set(
      (1L, 1L, "insert"), (2L, 1L, "insert"), (3L, 1L, "insert"),
      (2L, 2L, "delete"), (4L, 3L, "insert")))
    // batch twin: appendsBetween + deletesBetween over the same range
    val app = VersionedTable.appendsBetween(spark, t, 0L, 3L)
      .selectExpr("k", "_commit_version", "'insert' AS ct")
    val del = VersionedTable.deletesBetween(spark, t, 0L, 3L)
      .selectExpr("k", "_commit_version", "'delete' AS ct")
    val twin = app.union(del).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == twin, "CDF stream must equal the batch table_changes twin")
  }

  test("change-feed streams POSITIONAL delete commits as full reconstructed rows") {
    // a positional vector names (file, pos), not keys — the stream now
    // reconstructs the doomed rows per referenced data file instead of
    // failing loudly (the round-14 carve-out), and must equal the batch
    // deletesBetween twin value-for-value INCLUDING non-key columns
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      df(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"),
      t, append = false)
    VersionedTable.deleteWherePositional(spark, t, col("k") % 2L === 0L)
    VersionedTable.commit(df(6L -> "f"), t, append = true)
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(t)
      .writeStream.format("memory").queryName("vstream_cdf_pos")
      .option("checkpointLocation", s"$d/cp").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT k, v, _commit_version, _change_type FROM vstream_cdf_pos")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed == Set(
      (1L, "a", 1L, "insert"), (2L, "b", 1L, "insert"),
      (3L, "c", 1L, "insert"), (4L, "d", 1L, "insert"),
      (5L, "e", 1L, "insert"),
      (2L, "b", 2L, "delete"), (4L, "d", 2L, "delete"),
      (6L, "f", 3L, "insert")), streamed.toString)
    val del = VersionedTable.deletesBetween(spark, t, 1L, 2L)
      .selectExpr("k", "v", "_commit_version", "'delete' AS ct").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed.filter(_._4 == "delete") == del,
      "positional CDF stream must equal the batch deletesBetween twin")
  }

  test("overwrite fails the stream; delete fails unless ignoreDeletes") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 10L -> "x"), t, append = false)
    VersionedTable.deleteWhere(spark, t, col("k") === 10L, "k")
    VersionedTable.commit(df(2L -> "b"), t, append = true)

    val failing = spark.readStream.format("graft-table").load(t)
      .writeStream.format("memory").queryName("vstream_del_fail")
      .option("checkpointLocation", s"$d/cp_fail").start()
    val ex = intercept[StreamingQueryException] {
      try failing.processAllAvailable() finally failing.stop()
    }
    assert(ex.getMessage.contains("DELETE") || ex.getCause.getMessage.contains("DELETE"))

    val q = spark.readStream.format("graft-table")
      .option("ignoreDeletes", "true").load(t)
      .writeStream.format("memory").queryName("vstream_del_ok")
      .option("checkpointLocation", s"$d/cp_ok").start()
    try q.processAllAvailable() finally q.stop()
    assert(slurpSink("vstream_del_ok") ==
      Set((1L, "a", 1L), (10L, "x", 1L), (2L, "b", 3L)),
      "ignoreDeletes skips the tombstone commit, keeps the appends")

    VersionedTable.commit(df(9L -> "z"), t, append = false) // overwrite
    val q2 = spark.readStream.format("graft-table")
      .option("ignoreDeletes", "true").load(t)
      .writeStream.format("memory").queryName("vstream_ow")
      .option("checkpointLocation", s"$d/cp_ow").start()
    val ex2 = intercept[StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(ex2.getMessage.contains("OVERWRITE") ||
      ex2.getCause.getMessage.contains("OVERWRITE"))
  }

  test("startingVersion consumes changes from that version inclusive") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a"), t, append = false)
    VersionedTable.commit(df(2L -> "b"), t, append = true)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "2").load(t)
      .writeStream.format("memory").queryName("vstream_sv")
      .option("checkpointLocation", s"$d/cp")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(slurpSink("vstream_sv") == Set((2L, "b", 2L), (3L, "c", 3L)),
      "startingVersion=2 must skip version 1 and serve 2 and 3")
  }

  test("micro-batches vectorize for insert-only ranges; CDF delete rows fall back") {
    import graft.sources.{VersionedMicroBatchStream, VersionedFilePartition, VersionOffset}
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 2L -> "b"), t, append = false)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    val schema = spark.readStream.format("graft-table").load(t).schema
    val ms = new VersionedMicroBatchStream(t, schema, ignoreDeletes = false)
    val parts = ms.planInputPartitions(VersionOffset(0L), VersionOffset(2L))
      .map(_.asInstanceOf[VersionedFilePartition])
    assert(parts.nonEmpty && parts.forall(_.columnar),
      "insert-only micro-batch must plan columnar partitions")
    // a delete commit in CDF mode mixes key-only tombstone files in —
    // the whole batch falls back to the null-filling row decoder
    VersionedTable.deleteWhere(spark, t, col("k") === 1L, "k")
    val cdfSchema = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(t).schema
    val cdf = new VersionedMicroBatchStream(t, cdfSchema, ignoreDeletes = false,
      changeFeed = true)
    val parts2 = cdf.planInputPartitions(VersionOffset(0L), VersionOffset(3L))
      .map(_.asInstanceOf[VersionedFilePartition])
    assert(parts2.exists(_.changeType == "delete"))
    assert(parts2.forall(!_.columnar),
      "a batch holding delete rows must be uniformly row-decoded")
  }

  test("streams over TYPE-WIDENED tables stay columnar across generations") {
    import graft.sources.{VersionedMicroBatchStream, VersionedFilePartition, VersionOffset}
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(
      spark.range(1, 6).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id / 2 AS FLOAT) AS x"),
      t, append = false)
    VersionedTable.widenColumn(spark, t, "k",
      org.apache.spark.sql.types.LongType)
    VersionedTable.widenColumn(spark, t, "x",
      org.apache.spark.sql.types.DoubleType)
    VersionedTable.commit(
      spark.range(0, 1).selectExpr("CAST(6000000000 AS BIGINT) AS k", "CAST(1e200 AS DOUBLE) AS x"),
      t, append = true)
    val schema = spark.readStream.format("graft-table").load(t).schema
    val ms = new VersionedMicroBatchStream(t, schema, ignoreDeletes = false)
    val parts = ms.planInputPartitions(VersionOffset(0L), VersionOffset(3L))
      .map(_.asInstanceOf[VersionedFilePartition])
    assert(parts.nonEmpty && parts.forall(_.columnar),
      "widened generations must still plan columnar micro-batches")
    // end-to-end: the narrow generation's values promote exactly
    val q = spark.readStream.format("graft-table").load(t)
      .writeStream.format("memory").queryName("vs_widecol")
      .option("checkpointLocation", s"$d/cp").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT k, x FROM vs_widecol").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == (1L to 5L).map(i => (i, (i.toFloat / 2).toDouble)).toSet +
      ((6000000000L, 1e200)), got.toString)
  }

  test("fresh stream on a vacuumed table serves the oldest retained snapshot in full") {
    val d = freshDir()
    val t = s"$d/t"
    VersionedTable.commit(df(1L -> "a", 2L -> "b"), t, append = false)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    VersionedTable.commit(df(4L -> "d"), t, append = true)
    VersionedTable.vacuum(t, retain = 2) // keeps v2 (materialized), v3
    assert(VersionedTable.versions(t) == Seq(2L, 3L))
    // v1's rows survive only as carried entries of the materialized v2
    // manifest — a fresh-files-only plan would silently drop them; the
    // initial batch must serve snapshot v2 in full (stamped v2), then v3
    drainTo(t, "vstream_vac", s"$d/cp")
    assert(slurpSink("vstream_vac") ==
      Set((1L, "a", 2L), (2L, "b", 2L), (3L, "c", 2L), (4L, "d", 3L)),
      "initial load after vacuum must include the carried rows")
  }

  test("checkpointed offset below the retained history fails loudly, never drops rows") {
    val d = freshDir()
    val t = s"$d/t"
    def drainToFiles(): Unit = {
      val q = spark.readStream.format("graft-table").load(t)
        .writeStream.format("parquet")
        .option("path", s"$d/sink")
        .option("checkpointLocation", s"$d/cp")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.commit(df(1L -> "a"), t, append = false)
    drainToFiles() // checkpoint now holds offset 1
    VersionedTable.commit(df(2L -> "b"), t, append = true)
    VersionedTable.commit(df(3L -> "c"), t, append = true)
    VersionedTable.vacuum(t, retain = 1) // min version is now 3; offset 1 < 2
    val ex = intercept[StreamingQueryException] {
      drainToFiles()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("vacuumed") || msg.contains("predates"),
      s"a stale checkpoint over a vacuumed range must fail loudly: $msg")
  }
}
