package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MemberBloom

/** Array/map MEMBERSHIP file pruning: commit-time element blooms in the
  * manifest's sixth segment, `array_contains`/map-key conjuncts handed
  * to the scan by the PushMembershipProbes side channel, files whose
  * blooms positively exclude the key dropped at planning time — and
  * never a result difference.
  */
class MemberBloomSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private lazy val root = {
    val d = SparkTestBase.tempDir("graft_member_root")
    spark.conf.set("spark.sql.catalog.gmb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmb.root", d.toString)
    d.toString
  }

  private def plannedFiles(q: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val m = "files=(\\d+)/(\\d+)".r
      .findFirstMatchIn(q.queryExecution.executedPlan.toString)
      .getOrElse(fail("no graft-catalog scan in plan"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("bloom unit: set elements are found, absent keys are (mostly) excluded") {
    val b = new Array[Byte](MemberBloom.DefaultBits / 8)
    val in = (1 to 500).map(i => s"tag_$i")
    in.foreach(s => MemberBloom.set(b,
      MemberBloom.hashUtf8(org.apache.spark.unsafe.types.UTF8String.fromString(s))))
    assert(in.forall(s => MemberBloom.mightContain(b,
      MemberBloom.hashUtf8(org.apache.spark.unsafe.types.UTF8String.fromString(s)))),
      "no false negatives, ever")
    val falseKeeps = (1 to 1000).count(i => MemberBloom.mightContain(b,
      MemberBloom.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"other_$i"))))
    assert(falseKeeps < 100, s"fpp should be ~1.4% at n=500, got $falseKeeps/1000")
  }

  test("array_contains prunes files via commit-time blooms; results exact") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.tagged (
        |  id BIGINT, tags ARRAY<STRING>, n BIGINT)
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    // three tag-disjoint generations: langs, topics, sources
    Seq(("en", "de"), ("science", "law"), ("web", "book")).zipWithIndex
      .foreach { case ((a, b), i) =>
        spark.sql(
          s"""INSERT INTO gmb.default.tagged
             |SELECT id + ${i * 1000}, array(
             |  CASE WHEN id % 2 = 0 THEN '$a' ELSE '$b' END,
             |  concat('x', CAST(id % 7 AS STRING))), id
             |FROM range(0, 1000, 1, 1) AS t(id)""".stripMargin)
      }
    val q = spark.sql(
      "SELECT id, n FROM gmb.default.tagged WHERE array_contains(tags, 'en')")
    val (kept, total) = plannedFiles(q)
    // total counts the CREATE TABLE schema carrier too (a zero-row
    // file the kept set always drops)
    assert(kept == 1 && total == 4,
      s"the 'en' probe must keep only the first generation's file: $kept/$total")
    assert(q.count() === 500L)
    assert(q.collect().forall(r => r.getLong(0) % 2 == 0 && r.getLong(0) < 1000))
    // a key no file holds plans ZERO files
    val none = spark.sql(
      "SELECT id FROM gmb.default.tagged WHERE array_contains(tags, 'zz_missing')")
    assert(plannedFiles(none)._1 === 0 && none.count() === 0L)
    // conjunct composes with other predicates; a tag present in every
    // file adds NO pruning beyond the n-bound baseline (zero-row files
    // from parallel INSERTs drop either way)
    val baseline = plannedFiles(spark.sql(
      "SELECT id FROM gmb.default.tagged WHERE n < 10"))._1
    val shared = spark.sql(
      "SELECT id FROM gmb.default.tagged WHERE array_contains(tags, 'x3') AND n < 10")
    assert(plannedFiles(shared)._1 === baseline,
      "a tag present in every file prunes nothing")
    assert(shared.count() === 3L) // id % 7 == 3 && id < 10 → {3} per generation
  }

  test("map-key probes prune through the same blooms") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.kv (
        |  id BIGINT, attrs MAP<STRING, BIGINT>)
        |TBLPROPERTIES ('graft.member-cols' = 'attrs')""".stripMargin)
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (k, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.kv
           |SELECT id + ${i * 100}, map('$k', id, 'common', id * 2)
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    val q = spark.sql(
      "SELECT id FROM gmb.default.kv WHERE attrs['beta'] IS NOT NULL")
    val (kept, total) = plannedFiles(q)
    assert(kept == 1 && total == 4, s"the 'beta' key probe must prune: $kept/$total")
    assert(q.count() === 100L)
    val eq = spark.sql("SELECT id FROM gmb.default.kv WHERE attrs['gamma'] = 42")
    assert(plannedFiles(eq) == ((1, 4)))
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(242L))
    // the function-call spellings probe identically: map_contains_key
    // rewrites to array_contains(map_keys) before the rule runs, and
    // try_element_at matches the ElementAt case directly
    val mck = spark.sql(
      "SELECT id FROM gmb.default.kv WHERE map_contains_key(attrs, 'alpha')")
    assert(plannedFiles(mck)._1 === 1 && mck.count() === 100L)
    val tea = spark.sql(
      "SELECT id FROM gmb.default.kv WHERE try_element_at(attrs, 'beta') IS NOT NULL")
    assert(plannedFiles(tea)._1 === 1 && tea.count() === 100L)
    val teq = spark.sql(
      "SELECT id FROM gmb.default.kv WHERE element_at(attrs, 'gamma') = 42")
    assert(plannedFiles(teq)._1 === 1)
    assert(teq.collect().map(_.getLong(0)).toSeq == Seq(242L))
    // the common key keeps everything the probe-less scan keeps
    val baseline = plannedFiles(spark.sql("SELECT id FROM gmb.default.kv"))._1
    val all = spark.sql(
      "SELECT id FROM gmb.default.kv WHERE attrs['common'] IS NOT NULL")
    assert(plannedFiles(all)._1 === baseline)
    assert(all.count() === 300L)
  }

  test("integral element arrays prune too; undeclared columns never prune") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.toks (
        |  id BIGINT, toks ARRAY<BIGINT>, free ARRAY<STRING>)
        |TBLPROPERTIES ('graft.member-cols' = 'toks')""".stripMargin)
    Seq(0L, 1000L).zipWithIndex.foreach { case (base, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.toks
           |SELECT id + ${i * 100}, array(id + $base, id + $base + 1),
           |  array('t')
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    val q = spark.sql(
      "SELECT id FROM gmb.default.toks WHERE array_contains(toks, CAST(1005 AS BIGINT))")
    assert(plannedFiles(q) == ((1, 3)))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(104L, 105L))
    // 'free' declares no bloom: its probe keeps every file (omission =
    // cannot-exclude), results stay exact
    val baseline = plannedFiles(spark.sql("SELECT id FROM gmb.default.toks"))._1
    val un = spark.sql(
      "SELECT id FROM gmb.default.toks WHERE array_contains(free, 'zz')")
    assert(plannedFiles(un)._1 === baseline)
    assert(un.count() === 0L)
  }

  test("arrays_overlap probes prune disjunctively: keep any-match files, " +
      "drop only all-excluded ones") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.ovl (
        |  id BIGINT, tags ARRAY<STRING>)
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    Seq("en", "de", "fr", "zh").zipWithIndex.foreach { case (t, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.ovl
           |SELECT id + ${i * 100}, array('$t')
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    // a two-key IN-list keeps exactly the two matching generations
    val q = spark.sql(
      "SELECT id FROM gmb.default.ovl " +
        "WHERE arrays_overlap(tags, array('de', 'zh'))")
    val (kept, total) = plannedFiles(q)
    assert(kept == 2 && total == 5,
      s"the de|zh group must keep exactly two generations: $kept/$total")
    assert(q.count() === 200L)
    assert(q.collect().forall { r =>
      val v = r.getLong(0); (v >= 100 && v < 200) || v >= 300
    })
    // literal-first argument order recognizes too
    val q2 = spark.sql(
      "SELECT id FROM gmb.default.ovl " +
        "WHERE arrays_overlap(array('fr'), tags)")
    assert(plannedFiles(q2)._1 === 1 && q2.count() === 100L)
    // a group with NO present key plans zero files; a group containing
    // a null literal still prunes on the non-null keys (null elements
    // can never witness an overlap)
    val none = spark.sql(
      "SELECT id FROM gmb.default.ovl " +
        "WHERE arrays_overlap(tags, array('xx', 'yy'))")
    assert(plannedFiles(none)._1 === 0 && none.count() === 0L)
    val withNull = spark.sql(
      "SELECT id FROM gmb.default.ovl " +
        "WHERE arrays_overlap(tags, array('en', CAST(NULL AS STRING)))")
    assert(plannedFiles(withNull)._1 === 1 && withNull.count() === 100L)
  }

  test("member blooms ride the SEEK path: b~ rollup cells skip chunks " +
      "inside one giant commit, never materializing the O(files) map") {
    root
    val prev = graft.sources.VersionedTable.IndexChunkEntries
    graft.sources.VersionedTable.IndexChunkEntries = 50
    try {
      spark.sql(
        """CREATE TABLE gmb.default.seek (
          |  id BIGINT, tags ARRAY<STRING>)
          |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
      // ONE self-contained commit of 300 files (INSERT OVERWRITE →
      // indexed manifest), tags clustered with the id layout: tag g<k>
      // lives in exactly the 10 files covering ids [k*100, k*100+100)
      spark.sql(
        """INSERT OVERWRITE gmb.default.seek
          |SELECT id, array(concat('g', CAST(CAST(id / 100 AS INT) AS STRING)))
          |FROM range(0, 3000, 1, 300) AS t(id)""".stripMargin)
      val t = s"$root/default/seek"
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Files.list(java.nio.file.Paths.get(t, "_manifest"))
          .filter(_.toString.endsWith(".manifest"))
          .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
          .reduce((_, b) => b).get()),
        java.nio.charset.StandardCharsets.UTF_8)
      assert("rollup=\\S+ \\S*b~tags=".r.findFirstIn(manifest).isDefined,
        s"the commit rollup line must carry a b~ member cell:\n${manifest.take(400)}")
      assert("index=\\S+%\\d+ \\d+ \\d+ \\S*b~tags=".r.findFirstIn(manifest).isDefined,
        s"chunk index lines must carry b~ member cells:\n${manifest.take(600)}")
      // a member-probe-ONLY plan (no scalar bounds at all) engages the
      // seek path: chunks whose OR-bloom excludes 'g5' are never read
      val hits0 = graft.sources.VersionedTable.selectiveSeekHits.get()
      val q = spark.sql(
        "SELECT id FROM gmb.default.seek WHERE array_contains(tags, 'g5')")
      val (kept, total) = plannedFiles(q)
      assert(graft.sources.VersionedTable.selectiveSeekHits.get() > hits0,
        "the member-probe plan must be served by the seek-based fast path")
      assert(total >= 300 && kept <= 15,
        s"the g5 probe must keep ~10 of 300 files: $kept/$total")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == (500L until 600L),
        "chunk-level bloom skipping must be invisible to results")
      // WARM-path parity: an unfiltered scan materializes the reusable
      // full-layout memo; a later probe plan assembles from THAT memo
      // and must still prune dead-chunk files via the per-file serving
      // functions' not-in-selection signal (regression: Map.empty for
      // unserved paths silently kept all 300). sum() is NOT
      // manifest-answerable, so this scan really plans the full layout.
      assert(spark.sql("SELECT sum(id) FROM gmb.default.seek")
        .collect()(0).getLong(0) === (0L until 3000L).sum)
      val warm = spark.sql(
        "SELECT id FROM gmb.default.seek WHERE array_contains(tags, 'g5')")
      val (wKept, _) = plannedFiles(warm)
      assert(wKept == kept,
        s"warm (layout-memo) plan must prune like the cold seek plan: $wKept vs $kept")
      assert(warm.collect().map(_.getLong(0)).sorted.toSeq == (500L until 600L))
    } finally graft.sources.VersionedTable.IndexChunkEntries = prev
  }

  test("member blooms survive OPTIMIZE: rewritten files get fresh blooms " +
      "from the same commit stats job") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.opt (
        |  id BIGINT, tags ARRAY<STRING>)
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    Seq("en", "de", "fr").zipWithIndex.foreach { case (t, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.opt
           |SELECT id + ${i * 1000}, array('$t')
           |FROM range(0, 1000, 1, 1) AS t(id)""".stripMargin)
    }
    graft.sources.VersionedTable.optimize(spark, s"$root/default/opt", "id",
      targetRowsPerFile = 1000L)
    val q = spark.sql(
      "SELECT id FROM gmb.default.opt WHERE array_contains(tags, 'de')")
    val (kept, total) = plannedFiles(q)
    assert(kept < total && kept <= 2,
      s"pruning must survive the compaction rewrite: $kept/$total")
    assert(q.count() === 1000L)
    assert(q.collect().forall(r => r.getLong(0) >= 1000 && r.getLong(0) < 2000))
  }

  test("DOTTED member cols: meta.tags prunes through struct-leaf probes " +
      "and composes with nested rename") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.nested (
        |  id BIGINT, meta STRUCT<lang: STRING, tags: ARRAY<STRING>>)
        |TBLPROPERTIES ('graft.member-cols' = 'meta.tags')""".stripMargin)
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (t, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.nested
           |SELECT id + ${i * 100},
           |  named_struct('lang', 'xx', 'tags', array('$t', concat('c', CAST(id % 5 AS STRING))))
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    val q = spark.sql(
      "SELECT id FROM gmb.default.nested WHERE array_contains(meta.tags, 'beta')")
    val (kept, total) = plannedFiles(q)
    assert(kept == 1 && total == 4,
      s"the nested 'beta' probe must prune: $kept/$total")
    assert(q.count() === 100L)
    assert(q.collect().forall(r => r.getLong(0) >= 100 && r.getLong(0) < 200))
    // a tag present in every file prunes nothing; results exact
    val all = spark.sql(
      "SELECT id FROM gmb.default.nested WHERE array_contains(meta.tags, 'c3')")
    assert(all.count() === 60L)
    // rename the SPINE: probes keep pruning under the new logical name
    // (physDotted translates segment-by-segment back to the recorded
    // physical bloom key)
    spark.sql("ALTER TABLE gmb.default.nested RENAME COLUMN meta TO info")
    val q2 = spark.sql(
      "SELECT id FROM gmb.default.nested WHERE array_contains(info.tags, 'gamma')")
    assert(plannedFiles(q2)._1 === 1,
      "the probe must translate through the renamed spine")
    assert(q2.count() === 100L)
    // rename the LEAF too: info.tags → labels
    spark.sql("ALTER TABLE gmb.default.nested RENAME COLUMN info.tags TO labels")
    val q3 = spark.sql(
      "SELECT id FROM gmb.default.nested WHERE array_contains(info.labels, 'alpha')")
    assert(plannedFiles(q3)._1 === 1,
      "the probe must translate through the renamed leaf")
    assert(q3.count() === 100L)
    assert(q3.collect().forall(_.getLong(0) < 100))
  }

  test("DOTTED map member cols: meta.attrs key probes prune through the spine") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.nmap (
        |  id BIGINT, meta STRUCT<src: STRING, attrs: MAP<STRING, BIGINT>>)
        |TBLPROPERTIES ('graft.member-cols' = 'meta.attrs')""".stripMargin)
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (k, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.nmap
           |SELECT id + ${i * 100},
           |  named_struct('src', 'web', 'attrs', map('$k', id, 'common', id))
           |FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    val q = spark.sql(
      "SELECT id FROM gmb.default.nmap WHERE meta.attrs['beta'] IS NOT NULL")
    val (kept, total) = plannedFiles(q)
    assert(kept == 1 && total == 4,
      s"the nested map-key probe must prune: $kept/$total")
    assert(q.count() === 100L)
    assert(q.collect().forall(r => r.getLong(0) >= 100 && r.getLong(0) < 200))
    // equality form + the common key's no-pruning baseline
    val eq = spark.sql(
      "SELECT id FROM gmb.default.nmap WHERE meta.attrs['gamma'] = 42")
    assert(plannedFiles(eq)._1 === 1)
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(242L))
    val all = spark.sql(
      "SELECT id FROM gmb.default.nmap WHERE meta.attrs['common'] IS NOT NULL")
    assert(all.count() === 300L)
  }

  test("probes survive MOR tombstones and time travel") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.morq (
        |  id BIGINT, tags ARRAY<STRING>)
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    Seq("p", "q").zipWithIndex.foreach { case (t, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.morq
           |SELECT id + ${i * 100}, array('$t') FROM range(0, 100, 1, 1) AS t(id)""".stripMargin)
    }
    graft.sources.VersionedTable.deleteWherePositional(spark,
      s"$root/default/morq", col("id") % 10L === 0L)
    val q = spark.sql(
      "SELECT id FROM gmb.default.morq WHERE array_contains(tags, 'q')")
    assert(plannedFiles(q)._1 == 1 && plannedFiles(q)._2 >= 2)
    assert(q.count() === 90L)
    assert(q.collect().forall(r => r.getLong(0) >= 100 && r.getLong(0) % 10 != 0))
  }

  test("BUCKETED scans prune membership through the seek path's " +
      "chunk-granular blooms — never the global O(files) map") {
    root
    spark.sql(
      """CREATE TABLE gmb.default.btags (
        |  id BIGINT, tags ARRAY<STRING>, n BIGINT)
        |PARTITIONED BY (bucket(4, id))
        |TBLPROPERTIES ('graft.member-cols' = 'tags')""".stripMargin)
    // two tag-disjoint generations, each spread across all 4 buckets
    Seq("en", "de").zipWithIndex.foreach { case (tag, i) =>
      spark.sql(
        s"""INSERT INTO gmb.default.btags
           |SELECT id + ${i * 1000}, array('$tag',
           |  concat('x', CAST(id % 5 AS STRING))), id
           |FROM range(0, 1000, 1, 1) AS t(id)""".stripMargin)
    }
    val q = spark.sql(
      "SELECT id, n FROM gmb.default.btags WHERE array_contains(tags, 'de')")
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("graft-catalog-bucketed"),
      s"expected the bucketed scan:\n${desc.take(400)}")
    // pruning is per-bucket-list: only the 'de' generation's files plan
    // (the bucketed description carries a single planned-file count)
    def bucketedFiles(df: org.apache.spark.sql.DataFrame): Int =
      "files=(\\d+)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .getOrElse(fail("no bucketed file count")).group(1).toInt
    val baseline = bucketedFiles(
      spark.sql("SELECT id, n FROM gmb.default.btags"))
    val probed = bucketedFiles(q)
    assert(probed < baseline && probed > 0,
      s"the 'de' probe must drop the 'en' generation: $probed vs $baseline")
    // results exact — membership pruning can only skip, never change
    assert(q.count() === 1000L)
    assert(q.collect().forall(r => r.getLong(0) >= 1000L))
    // an absent key plans zero files and returns nothing
    val none = spark.sql(
      "SELECT id FROM gmb.default.btags WHERE array_contains(tags, 'zz')")
    assert(none.count() === 0L)
    // co-located self-join on the bucket key stays exchange-free BELOW
    // the join while the membership probe prunes one side
    val j = spark.sql(
      """SELECT a.id FROM gmb.default.btags a
        |JOIN gmb.default.btags b ON a.id = b.id
        |WHERE array_contains(a.tags, 'de')""".stripMargin)
    assert(j.count() === 1000L)
  }
}
