package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"$dir/documents.parquet"))

  test("decode emits deterministic features with the declared schema") {
    val f = Multimodal.decodeFeatures(assets)
    assert(f.columns.toSeq ==
      Seq("asset_id", "media_type", "n_bytes", "width", "height", "phash"))
    val rows = f.collect()
    assert(rows.nonEmpty)
    // deterministic: second run produces identical features
    val again = Multimodal.decodeFeatures(assets).collect()
    assert(rows.sortBy(_.asset_id).toSeq == again.sortBy(_.asset_id).toSeq)
    rows.foreach { r =>
      assert(r.width % 16 == 0 && r.width >= 16 && r.height % 16 == 0)
      assert(r.phash.length == 16)
    }
  }

  test("ImageIO decode: a real in-test PNG yields true dimensions and aHash") {
    import java.awt.image.BufferedImage
    // 20×10, left half black / right half white → aHash cells split
    // cleanly at column 4: each row byte is 0b11110000 = 0xf0
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = Multimodal.MediaAsset(7L, "image", bos.toByteArray, "test")
    val f = Multimodal.MediaDecoder.decode(png)
    assert(f.width == 20 && f.height == 10, s"true pixel dims, got $f")
    assert(f.phash == "f0f0f0f0f0f0f0f0", s"aHash of the half-split image, got ${f.phash}")
    assert(f.n_bytes == bos.size)

    // non-image bytes fall back to the deterministic stub — never throw
    val junk = Multimodal.MediaAsset(8L, "image", "not an image".getBytes("UTF-8"), "test")
    assert(Multimodal.MediaDecoder.decode(junk) == Multimodal.MediaDecoder.decodeStub(junk))

    // and through the distributed stage: both paths in one partition map
    val sparkS = spark
    import sparkS.implicits._
    val rows = Multimodal.decodeFeatures(Seq(png, junk).toDS())
      .collect().sortBy(_.asset_id)
    assert(rows(0) == f && rows(1) == Multimodal.MediaDecoder.decodeStub(junk))
  }

  test("resize respects target dims and stays deterministic in content") {
    val r = Multimodal.resize(assets, 64, 64).collect()
    assert(r.nonEmpty)
    r.foreach { a =>
      assert(a.target_w == 64 && a.target_h == 64)
      assert(a.payload.length <= 64 * 64 / 64)
    }
  }

  test("resize handles an empty payload without failing the stage") {
    val sparkS = spark
    import sparkS.implicits._
    val empty = Seq(Multimodal.MediaAsset(1L, "image", Array.empty[Byte], "t")).toDS()
    val r = Multimodal.resize(empty, 64, 64).collect()
    assert(r.length == 1 && r(0).payload.isEmpty)
  }

  test("WavCodec decodes an in-test generated 16-bit sine WAV exactly") {
    // hand-build a 16-bit mono WAV: a square "sine" alternating ±1000 at
    // 44100 Hz — peak and energy are known in closed form
    val n = 1000
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(88200).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(2 * n)
    for (i <- 0 until n) buf.putShort(if (i % 2 == 0) 1000 else -1000)
    val f = Multimodal.WavCodec.decode(5L, buf.array()).get
    assert(f.sample_rate == 44100 && f.n_channels == 1 && f.bits_per_sample == 16)
    assert(f.n_samples == 1000L)
    assert(f.duration_us == 1000L * 1000000L / 44100L)
    assert(f.peak == 1000 && f.energy == 1000L * 1000L * 1000L)
  }

  test("WavCodec 8-bit round-trip matches per-byte arithmetic; junk is total") {
    val samples = Array.tabulate[Byte](256)(i => i.toByte) // bytes 0..255
    val wav = Multimodal.WavCodec.encodePcm8Mono(samples, 8000)
    val f = Multimodal.WavCodec.decode(1L, wav).get
    assert(f.sample_rate == 8000 && f.bits_per_sample == 8 && f.n_samples == 256L)
    assert(f.duration_us == 256L * 125L)
    val centered = samples.map(b => (b & 0xff) - 128)
    assert(f.peak == centered.map(math.abs).max)
    assert(f.energy == centered.map(s => s.toLong * s).sum)

    // unparseable payloads: None from the codec, all-zero row from the stage
    assert(Multimodal.WavCodec.decode(2L, "not audio at all".getBytes).isEmpty)
    assert(Multimodal.WavCodec.decode(3L, wav.take(30)).isEmpty) // truncated
    val lying = wav.clone() // data chunk claims more bytes than exist
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 100000)
    assert(Multimodal.WavCodec.decode(4L, lying).isEmpty)

    val sparkS = spark
    import sparkS.implicits._
    val ds = Seq(
      Multimodal.MediaAsset(1L, "audio", wav, "t"),
      Multimodal.MediaAsset(2L, "audio", "junk".getBytes, "t")).toDS()
    val rows = Multimodal.decodeAudio(ds).collect().sortBy(_.asset_id)
    assert(rows(0) == f)
    assert(rows(1) == Multimodal.AudioFeatures(2L, 0, 0, 0, 0L, 0L, 0, 0L))
  }

  test("audioFeatures wraps documents as real WAV and decodes them back") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Multimodal.audioFeatures(docs).collect()
    assert(rows.length == docs.count())
    val lens = docs.selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach { r =>
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 8)
      assert(r.getLong(4) == lens(r.getLong(0)), s"n_samples of ${r.getLong(0)}")
      assert(r.getLong(5) == lens(r.getLong(0)) * 125L)
    }
  }

  test("Y4mCodec round-trips in-test generated video; junk and truncation are total") {
    // 3 mono 4×2 frames with known luma bytes
    val f0 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val f1 = Array[Byte](5, 5, 5, 5, 5, 5, 5, 5)
    val f2 = Array.tabulate[Byte](8)(i => (200 + i).toByte) // unsigned 200..207
    val y4m = Multimodal.Y4mCodec.encodeMono(Seq(f0, f1, f2), 4, 2)
    assert(new String(y4m.take(9)) == "YUV4MPEG2")
    val f = Multimodal.Y4mCodec.decode(1L, y4m).get
    assert(f.width == 4 && f.height == 2 && f.n_frames == 3)
    assert(f.luma_min == 5 && f.luma_max == 207)
    assert(f.luma_sum ==
      f0.map(_ & 0xff).sum.toLong + f1.map(_ & 0xff).sum + f2.map(_ & 0xff).sum)

    // a 420-layout frame: luma stats cover the Y plane only
    val header420 = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n".getBytes
    val y = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val uv = Array[Byte](100, 100, 101, 101) // 2 U + 2 V chroma bytes
    val v420 = header420 ++ "FRAME\n".getBytes ++ y ++ uv
    val g = Multimodal.Y4mCodec.decode(2L, v420).get
    assert(g.n_frames == 1 && g.luma_min == 1 && g.luma_max == 8 && g.luma_sum == 36L)

    // total on dirty data: junk, truncated frame, unknown colorspace
    assert(Multimodal.Y4mCodec.decode(3L, "not video".getBytes).isEmpty)
    assert(Multimodal.Y4mCodec.decode(4L, y4m.dropRight(3)).isEmpty)
    assert(Multimodal.Y4mCodec.decode(5L,
      "YUV4MPEG2 W4 H2 Cweird\nFRAME\n12345678".getBytes).isEmpty)

    val sparkS = spark
    import sparkS.implicits._
    val ds = Seq(
      Multimodal.MediaAsset(1L, "video", y4m, "t"),
      Multimodal.MediaAsset(2L, "video", "junk".getBytes, "t")).toDS()
    val rows = Multimodal.decodeVideo(ds).collect().sortBy(_.asset_id)
    assert(rows(0) == f)
    assert(rows(1) == Multimodal.VideoFeatures(2L, 0, 0, 0, 0, 0, 0L))
  }

  test("videoFeatures wraps documents as real Y4M and decodes them back") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Multimodal.videoFeatures(docs).collect()
    assert(rows.length == docs.count())
    val lens = docs.selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach { r =>
      val len = lens(r.getLong(0))
      assert(r.getInt(1) == 8 && r.getInt(2) == 8)
      assert(r.getInt(3) == math.max(1L, len / 64L), s"n_frames of ${r.getLong(0)}")
    }
  }

  test("frame sampling yields every stride-th frame of video assets only") {
    val frames = Multimodal.sampleFrames(assets, stride = 2, frameBytes = 64).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val videoIds = assets.filter(_.media_type == "video").collect().map(_.asset_id).toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
    // frame count follows payload length
    val byId = frames.groupBy(_.asset_id)
    val lens = assets.collect().map(a => a.asset_id -> a.payload.length).toMap
    byId.foreach { case (id, fs) =>
      val expected = (0 until math.max(1, lens(id) / 64) by 2).size
      assert(fs.length == expected, s"asset $id")
    }
  }
}
