package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential properties for the incremental chain-fold planning
  * memos under RANDOM op sequences (seeded): appends with stats,
  * merge-on-read deletes, checkpoints, vacuums. Each fold is checked
  * against ground truth computed a DIFFERENT way — file counts against
  * the resolved layout, chain dirs against the live entry walk, rollup
  * soundness against per-file stats, and the selective DML candidate
  * set against the old global-filter recipe — so a fold that merges a
  * version's declarations wrongly, survives a chain reshape it
  * shouldn't, or drops a live file cannot pass by construction.
  */
class ChainFoldPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private lazy val root = SparkTestBase.tempDir("chain_fold_prop").toString

  test("random append/delete/checkpoint/vacuum sequences: counts, dirs, " +
      "rollups, and reads stay consistent with ground truth at every step") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260817L)
    (0 until 3).foreach { run =>
      val t = s"$root/prop$run"
      // live model of table content: key -> value
      val model = scala.collection.mutable.Map.empty[Long, Long]
      def commitRows(lo: Long, n: Long, append: Boolean): Unit = {
        val rows = (lo until lo + n).map(k => (k, k * 3))
        if (!append) model.clear()
        rows.foreach { case (k, v) => model(k) = v }
        VersionedTable.commit(
          rows.toDF("k", "v").repartition(1 + rnd.nextInt(2)),
          t, append = append, statsCols = Seq("k"))
      }
      commitRows(0L, 50L, append = false)
      (1 to 12).foreach { step =>
        rnd.nextInt(10) match {
          case d if d <= 5 => // append a fresh key range
            commitRows(step.toLong * 1000L, 20L + rnd.nextInt(30), append = true)
          case 6 | 7 => // MOR delete of a random modulus class
            val m = 3L + rnd.nextInt(5)
            val doomed = model.keys.filter(_ % 10L == m).toSeq
            if (doomed.nonEmpty) {
              VersionedTable.deleteWhere(spark, t, col("k") % 10L === m, "k")
              doomed.foreach(model.remove)
            }
          case 8 => VersionedTable.checkpoint(t)
          case 9 => VersionedTable.vacuum(t, retain = 1 + rnd.nextInt(3))
        }
        val head = VersionedTable.versions(t).last
        // (a) reads equal the model exactly
        val got = VersionedTable.read(spark, t)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model.toMap,
          s"run $run step $step: content diverged (${got.size} vs ${model.size})")
        // (b) the fast header count equals the resolved layout's count
        val layout = VersionedTable.snapshotLayout(t, Some(head))
        VersionedTable.snapshotFileCountFast(t, Some(head)).foreach { fc =>
          assert(fc == layout.size,
            s"run $run step $step: fcount $fc != layout ${layout.size}")
        }
        // (c) chainDataDirs is a superset of live data dirs and excludes
        // tombstone-only dirs
        val liveDirs = layout.map(_._1.split('/')(1)).toSet
        VersionedTable.chainDataDirs(t, Some(head)).foreach { dirs =>
          assert(liveDirs.subsetOf(dirs.toSet),
            s"run $run step $step: live dirs missing: ${liveDirs -- dirs.toSet}")
        }
        // (d) rollup soundness: every live file's recorded zone sits
        // inside its commit dir's persisted rollup cell
        val rolls = VersionedTable.persistedRollups(t, Some(head))
        layout.foreach { case (path, _, _, stats) =>
          val dir = path.split('/')(1)
          stats.get("k").foreach { case (mn, mx) =>
            rolls.get(dir).flatMap(_.get("k")).foreach { case (rlo, rhi) =>
              assert(rlo <= mn && mx <= rhi,
                s"run $run step $step: $path zone [$mn,$mx] outside " +
                  s"$dir rollup [$rlo,$rhi]")
            }
          }
        }
        // (e) selective DML candidates equal the old global-filter
        // recipe on row-carrying files, for a random narrow range
        if (model.nonEmpty) {
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.size))
          val hi = lo + 500L
          val selective = VersionedTable.selectiveCandidates(
            t, Some(head), Map("k" -> (lo, hi)), Map.empty)
            .map(_._1).filterNot(p =>
              layout.find(_._1 == p).exists(_._4.isEmpty)).toSet
          val global = layout.filter { case (_, _, _, stats) =>
            stats.nonEmpty &&
              stats.get("k").forall { case (mn, mx) => mx >= lo && mn <= hi }
          }.map(_._1).toSet
          assert(selective == global,
            s"run $run step $step: candidates diverged for [$lo,$hi]: " +
              s"selective-only ${selective -- global}, " +
              s"global-only ${global -- selective}")
        }
      }
    }
  }
}
