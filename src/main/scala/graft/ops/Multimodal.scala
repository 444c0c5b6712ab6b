package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * "decoders".
  *
  * The Spark-side plumbing is real and tested — schema, partition-parallel
  * batch processing via `mapPartitions` on a typed Dataset, deterministic
  * output shape. The actual codec is STUBBED (this container has no
  * image/audio libraries): [[MediaDecoder.decodeStub]] derives deterministic
  * fake features from the bytes. Swapping in a real decoder changes one
  * function, not the pipeline.
  *
  * Scale: decode is a narrow map stage — no shuffle; partition count (i.e.
  * `spark.sql.files.maxPartitionBytes` on the media store) is the
  * parallelism knob; per-partition batching amortizes decoder init, the
  * same shape `mapInPandas`/`mapInArrow` gives a Python decoder.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String,
      payload: Array[Byte],
      source: String,
  )

  /** Deterministic decoded features (what a real image decode would emit:
    * dimensions, channel stats, a perceptual hash).
    */
  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      phash: String,
  )

  object MediaDecoder {
    /** STUB decoder: a real implementation would parse the codec here
      * (JPEG/PNG/WAV …). The container ships no media libraries, so this
      * derives deterministic pseudo-features from the payload bytes; the
      * surrounding plumbing (batching, schema, parallelism) is exactly what
      * a real decoder plugs into.
      */
    def decodeStub(a: MediaAsset): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(a.payload)
      def b(i: Int): Int = md(i) & 0xff
      MediaFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = a.payload.length,
        width = 16 * (b(0) + 1),  // fake dims, deterministic in content
        height = 16 * (b(1) + 1),
        phash = md.take(8).map("%02x".format(_)).mkString,
      )
    }
  }

  /** Manufacture a media table from `documents` (the container has no real
    * media fixtures): payload = UTF-8 bytes of the text, media_type round-
    * robins image/audio/video. Deterministic, so tests and the oracle can
    * rely on it.
    */
  def assetsFromDocuments(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("asset_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaAsset]
  }

  /** The decode stage: per-partition batch map over the typed Dataset.
    * This is the plumbing a real decoder drops into (decoder init once per
    * partition, then streamed batches).
    */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // real decoders initialize codec state here, once per partition
      it.map(MediaDecoder.decodeStub)
    }
  }

  /** A resized media asset (stub: a real implementation decodes, scales,
    * re-encodes; the stub derives a deterministic payload slice so the
    * schema/partitioning contract is real and testable).
    */
  final case class ResizedAsset(
      asset_id: Long,
      media_type: String,
      target_w: Int,
      target_h: Int,
      payload: Array[Byte],
  )

  /** Resize stage: same per-partition batch-map shape as [[decodeFeatures]].
    * STUB codec — payload is truncated/cycled to a size proportional to the
    * target area, deterministic in (content, target).
    */
  def resize(assets: Dataset[MediaAsset], targetW: Int, targetH: Int): Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val out =
          if (a.payload.isEmpty) Array.empty[Byte] // nothing to scale
          else {
            val outLen = math.max(1, math.min(a.payload.length, (targetW * targetH) / 64))
            Array.tabulate[Byte](outLen)(i => a.payload(i % a.payload.length))
          }
        ResizedAsset(a.asset_id, a.media_type, targetW, targetH, out)
      }
    }
  }

  /** One sampled frame of a video asset. */
  final case class Frame(asset_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling: every `stride`-th "frame" of video assets. STUB: a
    * frame is a fixed-size window over the payload; a real decoder seeks
    * keyframes. This is the one generator-shaped multimodal op (1 → N
    * rows), so it uses flatMap on the typed Dataset — still a narrow map
    * stage, no shuffle; downstream per-frame work parallelizes by
    * repartitioning on (asset_id, frame_idx) if needed.
    */
  def sampleFrames(assets: Dataset[MediaAsset], stride: Int = 4, frameBytes: Int = 256): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val nFrames = math.max(1, a.payload.length / frameBytes)
      (0 until nFrames by stride).map { f =>
        val from = f * frameBytes
        val slice = a.payload.slice(from, math.min(from + frameBytes, a.payload.length))
        // MessageDigest.digest resets after each call — safe to reuse
        Frame(a.asset_id, f, md.digest(slice).take(8).map("%02x".format(_)).mkString)
      }
    }
  }

  /** SQL-expressible metadata extraction over the binary payload (byte
    * length, content hash, hex preview) — the part of the multimodal path
    * the DuckDB oracle can replay exactly. `head_hex` previews the first 8
    * BYTES of the payload (the engine-correct semantics for opaque media);
    * the oracle twin slices 8 CHARACTERS because DuckDB has no BLOB
    * substring — equivalent only on the pure-ASCII synthetic corpus, and
    * documented as such next to the oracle SQL.
    */
  def binaryMeta(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        lower(hex(substring(col("text").cast("binary"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")
}
