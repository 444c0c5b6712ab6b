package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * "decoders".
  *
  * The Spark-side plumbing is real and tested — schema, partition-parallel
  * batch processing via `mapPartitions` on a typed Dataset, deterministic
  * output shape. The IMAGE codec is real: [[MediaDecoder.decode]] parses
  * PNG/JPEG/BMP/GIF via the JDK's built-in ImageIO (true dimensions + a
  * 64-bit average-hash). Audio/video codecs — and image bytes no ImageIO
  * reader accepts — fall back to [[MediaDecoder.decodeStub]]'s
  * deterministic pseudo-features (this container ships no media
  * libraries beyond the JDK); swapping in a richer decoder changes one
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

    /** Image decode via the JDK's built-in ImageIO readers (PNG / JPEG /
      * BMP / GIF — no external libraries, headless-safe): true pixel
      * dimensions plus a real 64-bit average-hash perceptual hash
      * ([[aHash]]). Total on any input: non-image media types, empty
      * payloads, and bytes no ImageIO reader accepts (e.g. the synthetic
      * text payloads this container's fixtures use) fall back to
      * [[decodeStub]], so the stage never throws on dirty data.
      */
    def decode(a: MediaAsset): MediaFeatures = {
      val img =
        if (a.media_type != "image" || a.payload.isEmpty) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
          catch { case _: java.io.IOException => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) decodeStub(a)
      else MediaFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = a.payload.length,
        width = img.getWidth,
        height = img.getHeight,
        phash = aHash(img))
    }

    /** Classic average-hash: mean luminance (Rec. 601 weights) over an 8×8
      * block downsample, one bit per cell (cell mean ≥ global mean), bit i
      * = cell (row i/8, col i%8), rendered as 16 lowercase hex chars —
      * same width as the stub's hash so the schema is codec-independent.
      */
    private def aHash(img: java.awt.image.BufferedImage): String = {
      val (w, h) = (img.getWidth, img.getHeight)
      val cells = new Array[Double](64)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val x0 = cx * w / 8; val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / 8))
          val y0 = cy * h / 8; val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / 8))
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          cells(cy * 8 + cx) = if (n == 0) 0.0 else sum / n
          cx += 1
        }
        cy += 1
      }
      val mean = cells.sum / 64
      var bits = 0L
      var i = 0
      while (i < 64) { if (cells(i) >= mean) bits |= (1L << i); i += 1 }
      f"$bits%016x"
    }

    /** STUB decoder — the fallback [[decode]] uses when no JDK ImageIO
      * reader accepts the payload (and for the audio/video codecs this
      * container cannot ship): derives deterministic pseudo-features from
      * the payload bytes, so the surrounding plumbing (batching, schema,
      * parallelism) exercises exactly what a real codec plugs into.
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
      // per-partition decoder init: ImageIO's stream cache would otherwise
      // spill every payload to a temp file — decode from memory instead
      javax.imageio.ImageIO.setUseCache(false)
      it.map(MediaDecoder.decode)
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
