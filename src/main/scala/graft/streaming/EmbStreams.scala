package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming over the embeddings table shape
  * (vec_id, embedding: array<float>): ingest-time embedding-cosine
  * near-duplicate candidates.
  *
  * The embedding leg of the streaming dedup story: documents get
  * [[DocStreams.lshCandidateStream]] (MinHash bands), embeddings get SRP
  * sign buckets — the signature stage
  * ([[graft.ops.Similarity.srpBucketed]]) is fully narrow (a per-row
  * sign-pattern expression, no aggregation), so the exact batch
  * expression runs on the unbounded stream and only bucket membership is
  * state, handled by the same capped-bucket machine as the document leg.
  */
object EmbStreams {

  /** Streaming SRP-LSH near-dup candidates: each arriving embedding is
    * sign-bucketed per table ([[graft.ops.Similarity.srpBucketed]] — the
    * same hyperplanes as the batch ops), then each (table, bucket) joins
    * its bucket state and pairs with every member already accepted.
    * Bucket caps, tombstones, and at-least-once pair emission follow
    * [[DocStreams.bucketedPairStream]]'s contract; the exact-cosine
    * verify is a downstream batch join, the same generate/verify split
    * as the batch twin [[graft.ops.Similarity.srpCandidatePairs]]
    * (equivalence pinned by `EmbStreamsSpec`).
    */
  def srpCandidateStream(
      embeddings: DataFrame,
      maxBucket: Int = 1000): Dataset[DocStreams.CandidatePair] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    DocStreams.bucketedPairStream(
      graft.ops.Similarity.srpBucketed(embeddings)
        .select(col("vec_id").as("_1"), col("t").as("_2"),
          col("b").cast("string").as("_3"))
        .as[(Long, Int, String)],
      maxBucket)
  }
}
