package graft

import graft.ops.Similarity
import graft.streaming.EmbStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SRP-LSH candidates must agree with the batch generator
  * ([[Similarity.srpCandidatePairs]]) on the same embeddings, across
  * micro-batch boundaries — the embedding leg of the ingest-dedup story
  * (document leg: [[DocStreamsSpec]]).
  */
class EmbStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** The full sf0.001 embeddings as (vec_id, embedding) rows. */
  private def vectors(): Seq[(Long, Seq[Float])] = {
    val sparkS = spark
    import sparkS.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
      .as[(Long, Seq[Float])].collect().toSeq
  }

  test("streaming SRP candidates equal the batch pairs across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = vectors().sortBy(_._1)
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = EmbStreams.srpCandidateStream(
        input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("srp_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_a, doc_b FROM srp_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct.sorted
      val batch = Similarity.srpCandidatePairs(
          all.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(batch.nonEmpty, "batch generator found no candidates — corpus is wrong")
      assert(streamed.toSeq == batch, s"streaming ${streamed.length} pairs != batch ${batch.length}")
    } finally query.stop()
  }

  test("capped SRP bucket closes and stops emitting, like the document leg") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical vectors land in the same bucket of EVERY table
    val v = Seq.fill(Similarity.SrpDim)(1.0f)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = EmbStreams.srpCandidateStream(
        input.toDF().toDF("vec_id", "embedding"), maxBucket = 2)
      .writeStream.format("memory").queryName("srp_cap_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, v), (2L, v), (3L, v)))
      query.processAllAvailable()
      input.addData(Seq((4L, v)))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_a, doc_b FROM srp_cap_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct.sorted
      assert(streamed.toSeq == Seq((1L, 2L)),
        s"expected only the pre-cap pair, got ${streamed.toSeq}")
    } finally query.stop()
  }
}
