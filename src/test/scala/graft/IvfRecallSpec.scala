package graft

import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Measures the IVF ANN path's recall against the exact brute-force
  * ranking — the documented tradeoff of the cell-bounded search.
  *
  * Recall findings (recorded; the numbers below are measured by the tests):
  * the synthetic embeddings are ISOTROPIC — pairwise cosine is centered on
  * 0 with max ≈ 0.48, i.e. there are no clusters for any partitioner to
  * find. Consequence: single-probe recall is ≈ the corpus fraction one
  * cell holds, REGARDLESS of centroid quality — Lloyd-refined centroids
  * ([[graft.ops.Similarity.kmeansCentroids]], measured here) land within
  * noise of the modulo seeds (≈0.35–0.39 @ 5 cells), exactly as theory
  * predicts for structureless data. The lever that does work on such data
  * is multi-probe ([[graft.ops.Similarity.ivfTopKMultiProbe]]): recall
  * scales ~linearly with probed fraction (measured ≈0.78 at nprobe=3 of
  * 5). On a real, clustered corpus the k-means path is what makes
  * single-probe recall usable; both paths are oracle-verified
  * (q_emb_ivf_kmeans, q_emb_ivf_mp) and share the cell-bounded execution
  * shape, so the 100 TB plan is unchanged whichever knob is turned.
  */
class IvfRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def recallOf(approx: org.apache.spark.sql.DataFrame,
      exact: Set[(Long, Long)]): Double = {
    val a = approx.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    (exact intersect a).size.toDouble / exact.size
  }

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val exactPairs = Similarity.bruteForceTopK(embs).collect()
    .map(r => (r.getLong(0), r.getLong(2))).toSet

  test("IVF top-k recall@5 vs brute force is measured and above floor") {
    val recall = recallOf(Similarity.ivfTopK(embs), exactPairs)
    info(f"IVF recall@5 over ${exactPairs.size} exact pairs: $recall%.3f")
    // Cell-bounded search with modulo centroids on 500 docs / 5 cells:
    // every query still finds most true neighbors in its own cell. The
    // floor is deliberately loose — the assertion is that the recall knob
    // WORKS (non-trivial overlap with exact), the info line records the
    // measured value for the round's report.
    assert(recall >= 0.3, f"IVF recall collapsed: $recall%.3f")
    assert(recall <= 1.0)
  }

  test("Lloyd-refined centroids match modulo seeds on isotropic data (root-cause)") {
    val kmAssign = Similarity.ivfAssignKMeans(embs)
    val km = recallOf(
      Similarity.ivfTopK(embs, precomputedAssign = Some(kmAssign)), exactPairs)
    val mod = recallOf(Similarity.ivfTopK(embs), exactPairs)
    info(f"recall@5: kmeans(2 iters)=$km%.3f vs modulo=$mod%.3f")
    // The point being pinned: on structureless vectors centroid refinement
    // CANNOT raise single-probe recall (recall ≈ fraction scanned). If this
    // band ever breaks upward, the corpus gained cluster structure and the
    // k-means path should become the default.
    assert((km - mod).abs <= 0.15,
      f"kmeans vs modulo recall diverged: $km%.3f vs $mod%.3f")
    assert(km >= 0.25, f"kmeans cells collapsed: $km%.3f")
  }

  test("multi-probe is the working recall knob: recall@5 >= 0.7 at nprobe=3") {
    val mp = recallOf(Similarity.ivfTopKMultiProbe(embs, nprobe = 3), exactPairs)
    val sp = recallOf(Similarity.ivfTopK(embs), exactPairs)
    info(f"recall@5: nprobe=3 → $mp%.3f (single-probe $sp%.3f)")
    assert(mp >= 0.7, f"multi-probe recall below target: $mp%.3f")
    assert(mp > sp, "multi-probe did not improve on single-probe")
  }

  test("coarser cells (smaller stride) trade recall for less work") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // stride 100 → ~5 centroids; stride 25 → ~20 centroids (smaller cells,
    // fewer candidates scanned per query, lower recall ceiling)
    val cells100 = Similarity.ivfAssign(embs, 100).select("cell").distinct().count()
    val cells25 = Similarity.ivfAssign(embs, 25).select("cell").distinct().count()
    assert(cells25 > cells100)
  }

  test("semantic dedup: total partition, one min-id representative per group, pairs co-clustered") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semanticDedup(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == embs.count(), "every vector must appear exactly once")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid not labeled by its min member")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid,
        s"cluster $cid must keep exactly its min id")
    }
    // every near-dup pair must land in the same cluster (edges respected)
    val label = out.map(t => t._1 -> t._2).toMap
    Similarity.cosineNearDupPairs(embs).select("id_a", "id_b").collect()
      .foreach(r => assert(label(r.getLong(0)) == label(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters"))
  }
}
