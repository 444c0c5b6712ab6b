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
