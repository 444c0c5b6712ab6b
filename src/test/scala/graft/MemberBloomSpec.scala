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
}
