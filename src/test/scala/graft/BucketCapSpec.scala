package graft

import graft.ops.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded-bucket behavior of every banded/bucketed pair
  * generator: a bucket larger than `maxBucket` is dropped ENTIRELY (its
  * members produce no pairs), while under-cap buckets produce the full
  * in-bucket pair set. This is the skew guard that keeps one degenerate
  * bucket (boilerplate text, near-zero embeddings, an over-attracting IVF
  * centroid) from emitting O(bucket²) pairs at web scale.
  */
class BucketCapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // 8 identical documents — every band of every scheme puts them in ONE bucket.
  private def dupDocs = {
    val sparkS = spark
    import sparkS.implicits._
    (1L to 8L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again and again"))
      .toDF("doc_id", "text")
  }

  // 8 identical embeddings — one SRP bucket per table, one IVF cell.
  private def dupEmbs = {
    val sparkS = spark
    import sparkS.implicits._
    (0L to 7L).map(i => (i, Array.fill(64)(0.1f))).toDF("vec_id", "embedding")
  }

  test("simhashNearDupPairs drops an over-cap bucket, keeps an under-cap one") {
    assert(Dedup.simhashNearDupPairs(dupDocs, maxBucket = 5).count() == 0L)
    val r = Dedup.simhashNearDupPairs(dupDocs, maxBucket = 8).collect()
    assert(r.length == 28) // C(8,2)
    assert(r.forall(_.getLong(2) == 0L)) // identical fingerprints
  }

  test("srpNearDupPairs drops an over-cap bucket, keeps an under-cap one") {
    assert(Similarity.srpNearDupPairs(dupEmbs, maxBucket = 5).count() == 0L)
    val r = Similarity.srpNearDupPairs(dupEmbs, maxBucket = 8).collect()
    assert(r.length == 28)
    assert(r.forall(_.getDouble(2) == 1.0))
  }

  test("cosineNearDupPairs drops an over-cap cell, keeps an under-cap one") {
    assert(Similarity.cosineNearDupPairs(dupEmbs, maxCell = 5).count() == 0L)
    val r = Similarity.cosineNearDupPairs(dupEmbs, maxCell = 8).collect()
    assert(r.length == 28)
    assert(r.forall(_.getDouble(2) == 1.0))
  }

  test("lshCandidatePairs keeps its existing cap semantics") {
    assert(Dedup.lshCandidatePairs(dupDocs, maxBucket = 5).count() == 0L)
    assert(Dedup.lshCandidatePairs(dupDocs, maxBucket = 8).count() == 28L)
  }
}
