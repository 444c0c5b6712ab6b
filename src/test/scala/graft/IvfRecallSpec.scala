package graft

import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Measures the IVF ANN path's recall against the exact brute-force
  * ranking — the documented tradeoff of the cell-bounded search.
  *
  * Centroid-selection decision (recorded): centroids are the modulo
  * pseudo-sample (`vec_id % stride = 0`), NOT k-means. Rationale: (a) the
  * DuckDB oracle replays the whole algorithm bit-exactly, which k-means
  * iterations (float accumulation order, tie-breaking) would break across
  * engines; (b) the execution SHAPE — broadcast centroids, argmin assign,
  * equi-join on cell — is identical either way, so the 100 TB plan is
  * unchanged; (c) upgrading to k-means|| seeding is isolated to
  * `Similarity.centroids` (one extra job before the assign), swapping
  * centroid quality without touching any downstream operator. This spec
  * quantifies what modulo centroids cost in recall so the tradeoff is a
  * number, not a guess.
  */
class IvfRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("IVF top-k recall@5 vs brute force is measured and above floor") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@5 over ${exact.size} exact pairs: $recall%.3f")
    // Cell-bounded search with modulo centroids on 500 docs / 5 cells:
    // every query still finds most true neighbors in its own cell. The
    // floor is deliberately loose — the assertion is that the recall knob
    // WORKS (non-trivial overlap with exact), the info line records the
    // measured value for the round's report.
    assert(recall >= 0.3, f"IVF recall collapsed: $recall%.3f")
    assert(recall <= 1.0)
  }

  test("coarser cells (smaller stride) trade recall for less work") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // stride 100 → ~5 centroids; stride 25 → ~20 centroids (smaller cells,
    // fewer candidates scanned per query, lower recall ceiling)
    val cells100 = Similarity.ivfAssign(embs, 100).select("cell").distinct().count()
    val cells25 = Similarity.ivfAssign(embs, 25).select("cell").distinct().count()
    assert(cells25 > cells100)
  }
}
