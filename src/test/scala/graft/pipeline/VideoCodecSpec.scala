package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The REAL video container path: minimal RIFF/AVI with uncompressed DIB
  * frames, written and parsed in pure JVM. Exercises container structure
  * (nested LISTs, even-padding), bottom-up row order, stride padding and
  * the frame-sampling arithmetic against pixel values we control exactly.
  */
class VideoCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def px(f: Int, x: Int, y: Int): Int = (x * 3 + y * 5 + f * 7) % 256

  test("AVI roundtrip: container magic, frame count, exact pixels") {
    val (w, h, nf) = (10, 7, 4) // w*3=30 -> stride 32: padding exercised
    val avi = Multimodal.encodeAviDib(w, h, nf, px)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val (dw, dh, frames) = Multimodal.decodeAviDib(avi).get
    assert(dw == w && dh == h && frames.length == nf)
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      assert(Multimodal.dibPixel(frames(f), w, h, x, y) == px(f, x, y),
        s"pixel mismatch at f=$f x=$x y=$y")
  }

  test("odd-width frames honor 4-byte stride and odd-size RIFF padding") {
    val (w, h, nf) = (3, 3, 3) // 3*3=9 bytes/row -> stride 12; odd sizes
    val avi = Multimodal.encodeAviDib(w, h, nf, px)
    val (dw, dh, frames) = Multimodal.decodeAviDib(avi).get
    assert(dw == w && dh == h && frames.length == nf)
    assert(Multimodal.dibPixel(frames(2), w, h, 2, 2) == px(2, 2, 2))
  }

  test("non-AVI payloads return None") {
    assert(Multimodal.decodeAviDib("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeAviDib("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeAviDib(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAviDib(
      Multimodal.encodeWavPcm16(Array.fill(16)(0.toShort), 8000f)).isEmpty)
  }

  test("degenerate AVIs quarantine (None), never throw") {
    // zero-frame container: videoStats would index frames(0)
    val empty = Multimodal.encodeAviDib(8, 8, nFrames = 0, px)
    assert(Multimodal.decodeAviDib(empty).isEmpty)
    assert(Multimodal.videoStats(1L, empty, n = 2).isEmpty)
    val emptyMj = Multimodal.encodeAviMjpeg(8, 8, nFrames = 0, px)
    assert(Multimodal.decodeAviMjpeg(emptyMj).isEmpty)
    assert(Multimodal.mjpegVideoStats(1L, emptyMj, n = 2).isEmpty)
    // chunk size near Int.MaxValue: Int arithmetic would wrap the
    // bounds check negative and copyOfRange would throw
    val hostile = Multimodal.encodeAviDib(4, 4, nFrames = 1, px).clone()
    // find a 00db chunk and poison its size field (little-endian)
    val idx = {
      val pat = "00db".getBytes
      (0 until hostile.length - 4).find(i =>
        hostile.slice(i, i + 4).sameElements(pat)).get
    }
    hostile(idx + 4) = 0xfc.toByte
    hostile(idx + 5) = 0xff.toByte
    hostile(idx + 6) = 0xff.toByte
    hostile(idx + 7) = 0x7f.toByte
    assert(Multimodal.videoStats(1L, hostile, n = 2).isEmpty)
  }

  test("videoStats samples the evenly spaced frame indices exactly") {
    val (w, h, nf) = (4, 4, 5)
    val avi = Multimodal.encodeAviDib(w, h, nf, px)
    val st = Multimodal.videoStats(9L, avi, n = 2).get
    // sampled indices: floor(5*0/2)=0, floor(5*1/2)=2
    val expected = (for {
      f <- Seq(0, 2); y <- 0 until h; x <- 0 until w
    } yield px(f, x, y).toLong).sum
    assert(st == Multimodal.VideoStats(9L, nf, w, h, expected))
  }

  test("MJPEG roundtrip: structure exact, pixels within PSNR bound") {
    // a smooth gradient (JPEG-friendly): quality 0.9 must reconstruct
    // within a comfortable PSNR; structure (dims, frame count) is exact
    val (w, h, nf) = (32, 24, 3)
    def smooth(f: Int, x: Int, y: Int): Int = (x * 4 + y * 3 + f * 11) % 200
    val avi = Multimodal.encodeAviMjpeg(w, h, nf, smooth, quality = 0.9f)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    val (dw, dh, frames) = Multimodal.decodeAviMjpeg(avi).get
    assert(dw == w && dh == h && frames.length == nf)
    var se = 0.0
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val d = frames(f).getRaster.getSample(x, y, 0) - smooth(f, x, y)
      se += d.toDouble * d
    }
    val mse = se / (nf * w * h)
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(mse, 1e-12))
    assert(psnr > 30.0, f"MJPEG PSNR $psnr%.1f dB below bound (mse=$mse%.2f)")
    // the compressed stream is genuinely smaller than raw DIB frames
    assert(avi.length < Multimodal.encodeAviDib(w, h, nf, smooth).length / 2,
      s"MJPEG (${avi.length} B) not smaller than half the DIB encoding")
  }

  test("MJPEG encode is deterministic; wrong-codec payloads are rejected") {
    val a = Multimodal.encodeAviMjpeg(16, 16, 2, px)
    val b = Multimodal.encodeAviMjpeg(16, 16, 2, px)
    assert(java.util.Arrays.equals(a, b), "JPEG encode not deterministic")
    // a DIB AVI is not an MJPEG stream and vice versa — no cross-decode
    val dib = Multimodal.encodeAviDib(16, 16, 2, px)
    assert(Multimodal.decodeAviMjpeg(dib).isEmpty)
    assert(Multimodal.decodeAviDib(a).isEmpty)
    assert(Multimodal.decodeAviMjpeg("garbage".getBytes).isEmpty)
  }

  test("mjpegVideoStats samples frames and is deterministic") {
    val avi = Multimodal.encodeAviMjpeg(8, 8, 5, px)
    val s1 = Multimodal.mjpegVideoStats(3L, avi, n = 2).get
    val s2 = Multimodal.mjpegVideoStats(3L, avi, n = 2).get
    assert(s1 == s2)
    assert(s1.nFrames == 5 && s1.width == 8 && s1.height == 8)
    assert(s1.sumSampled > 0)
  }

  test("extractVideoStats runs distributed and drops undecodable rows") {
    import spark.implicits._
    val rows = (0L until 10L).map { id =>
      if (id % 5 == 2)
        Multimodal.MediaRow(id, "video", s"corrupt-$id".getBytes, 0, 0)
      else Multimodal.MediaRow(id, "video",
        Multimodal.encodeAviDib(6, 4, 3, (f, x, y) => (f + x + y + id.toInt) % 256),
        6, 4)
    }
    val out = Multimodal.extractVideoStats(
      spark.createDataset(rows).repartition(3), n = 2)
      .collect().sortBy(_.mediaId)
    assert(out.length == 8)
    assert(out.forall(s => s.nFrames == 3 && s.width == 6 && s.height == 4))
  }
}
