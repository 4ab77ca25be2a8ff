package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The REAL image codec path (JDK ImageIO — no native libs): decode,
  * stats, features, resize, and the distributed extractImageStats stage.
  * Reference capability: dblink has no multimodal columns at all; this is
  * the training-data-pipeline extension surface, exercised end to end
  * against pixel values we control exactly.
  */
class ImageCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gradient(w: Int, h: Int) =
    Multimodal.grayImage(w, h, (x, y) => (x * 7 + y * 13) % 256)

  test("PNG roundtrip preserves exact pixel sums and dimensions") {
    val img = gradient(24, 16)
    val png = Multimodal.encodePng(img)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val back = Multimodal.decodeImage(png).get
    val st = Multimodal.imageStats(7L, back)
    val expected = (for { y <- 0 until 16; x <- 0 until 24 }
      yield (x * 7 + y * 13) % 256).map(_.toLong).sum
    assert(st == Multimodal.ImageStats(7L, 24, 16, expected))
  }

  test("JPEG and BMP payloads decode with correct dimensions") {
    for (fmt <- Seq("jpg", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gradient(32, 20), fmt, bos)
      val img = Multimodal.decodeImage(bos.toByteArray).get
      assert(img.getWidth == 32 && img.getHeight == 20, fmt)
      // JPEG is lossy — dims are exact, pixels only close. BMP is lossless.
      if (fmt == "bmp") {
        val st = Multimodal.imageStats(0L, img)
        assert(st.sumLuma == Multimodal.imageStats(0L, gradient(32, 20)).sumLuma)
      }
    }
  }

  test("non-image payloads return None, never throw") {
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(Array.fill(64)(0x42.toByte)).isEmpty)
  }

  test("decodeImageFeatures: dims, mean luma, histogram mass") {
    val flat = Multimodal.grayImage(10, 10, (_, _) => 128)
    val f = Multimodal.decodeImageFeatures(Multimodal.encodePng(flat), 8).get
    assert(f(0) == 10f && f(1) == 10f)
    assert(math.abs(f(2) - 128 / 255.0) < 1e-6)
    // all mass in the bin containing 128: bins = 8-3 = 5, bin = 128*5/256 = 2
    assert(f(3 + 2) == 1.0f)
    assert((3 until 8).map(f(_)).sum == 1.0f)
    assert(Multimodal.decodeImageFeatures("text".getBytes, 8).isEmpty)
  }

  test("resizeImageBytes produces a decodable image at the target size") {
    val png = Multimodal.encodePng(gradient(40, 30))
    val resized = Multimodal.resizeImageBytes(png, 10, 6)
    val img = Multimodal.decodeImage(resized).get
    assert(img.getWidth == 10 && img.getHeight == 6)
    // non-image payload passes through untouched
    val raw = "plain bytes".getBytes
    assert(Multimodal.resizeImageBytes(raw, 4, 4).sameElements(raw))
  }

  test("extractFeaturesAuto dispatches per modality, falls back on corrupt") {
    import spark.implicits._
    val img = Multimodal.MediaRow(1L, "image",
      Multimodal.encodePng(gradient(12, 8)), 12, 8)
    val aud = Multimodal.MediaRow(2L, "audio",
      Multimodal.encodeWavPcm16(Array.fill(64)(1000.toShort), 8000f), 0, 0)
    val vid = Multimodal.MediaRow(3L, "video",
      Multimodal.encodeAviDib(6, 4, 3, (f, x, y) => f + x + y), 6, 4)
    val bad = Multimodal.MediaRow(4L, "image", "not an image".getBytes, 0, 0)
    val out = Multimodal.extractFeaturesAuto(
        spark.createDataset(Seq(img, aud, vid, bad)), dim = 8)
      .collect().map(f => f.mediaId -> f).toMap
    assert(out.size == 4)                        // fallback keeps 1:1
    assert(out(1L).features(0) == 12f && out(1L).features(1) == 8f)
    assert(math.abs(out(2L).features(0) - 1000 / 32768.0) < 1e-4) // audio RMS
    assert(out(3L).features(0) == 6f && out(3L).features(2) == 3f)
    // corrupt image fell back to the signal view of the raw bytes
    assert(out(4L).features.sameElements(
      Multimodal.decodeSignal("not an image".getBytes, 8)))
  }

  test("extractImageStats runs distributed and drops undecodable rows") {
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      if (id % 5 == 4)
        Multimodal.MediaRow(id, "image", s"corrupt-$id".getBytes, 0, 0)
      else {
        val w = 8 + id.toInt % 4
        Multimodal.MediaRow(id, "image",
          Multimodal.encodePng(Multimodal.grayImage(w, 6,
            (x, y) => (x + y + id.toInt) % 256)), w, 6)
      }
    }
    val out = Multimodal.extractImageStats(
      spark.createDataset(rows).repartition(3)).collect().sortBy(_.mediaId)
    assert(out.length == 16)            // 4 corrupt rows quarantined
    assert(out.forall(s => s.height == 6 && s.width == 8 + (s.mediaId % 4)))
    val id0 = out.find(_.mediaId == 0L).get
    val expected = (for { y <- 0 until 6; x <- 0 until 8 }
      yield (x + y) % 256).map(_.toLong).sum
    assert(id0.sumLuma == expected)
  }
}
