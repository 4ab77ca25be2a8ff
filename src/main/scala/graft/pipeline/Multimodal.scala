package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode/feature-extract/
  * frame-sample run batch-wise inside mapPartitions over a typed Dataset
  * (the Scala analog of `mapInPandas` — one JVM-side batch loop, arbitrary
  * native calls inside, schema declared up front).
  *
  * Feature extraction is REAL on two modalities:
  *  - images: `decodeImage`/`extractImageStats`/`resizeImageBytes` run the
  *    JDK's ImageIO codecs (JPEG/PNG/BMP/GIF/TIFF — java.desktop, pure
  *    Java, headless-safe). The q_image_decode gate query PNG-encodes a
  *    deterministic pattern, decodes it back through ImageIO, and
  *    hash-compares exact integer pixel sums against a DuckDB closed form.
  *  - audio-style signals: `decodeSignal` treats the payload as signed
  *    8-bit PCM and computes RMS, zero-crossing rate and Goertzel
  *    spectral-band energies (pure tones concentrate in the matching
  *    band; see the spec).
  * Video is real at two compression tiers: uncompressed-DIB AVI
  * (lossless, DuckDB-oracle-gated) and Motion-JPEG AVI (REAL lossy
  * compression — the JDK's JPEG codec per frame — spec-gated on PSNR,
  * structure and determinism since lossy pixels have no closed form).
  * Only inter-frame-predicted formats the JDK lacks (H.264/MP4,
  * VP9/WebM, WebP, …) still need an FFI codec; `decodeStub` remains as
  * the placeholder for that hop, and the Spark-side contract — schema,
  * batching, partition sizing, skew behavior — is identical either way.
  */
object Multimodal {

  final case class MediaRow(
      mediaId: Long,
      kind: String,           // "image" | "audio" | "video"
      payload: Array[Byte],
      declaredWidth: Int,
      declaredHeight: Int)

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      byteLen: Int,
      checksum: Long,
      features: Array[Float])

  final case class FrameSample(
      mediaId: Long,
      frameIndex: Int,
      frameOffset: Int,
      frameChecksum: Long)

  /** Wrap a text table into a media-shaped Dataset (payload = UTF-8
    * bytes), used to exercise the plumbing against the `documents` table. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("mediaId"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      (length(col("text")) % 640).cast("int").as("declaredWidth"),
      (length(col("text")) % 480).cast("int").as("declaredHeight"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic fake feature vector from payload bytes.
    * Replace with a real codec (libjpeg/ffmpeg via FFI) in production —
    * the signature (bytes in, fixed-dim float features out) is the
    * production contract. */
  private[pipeline] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % dim) += (h & 0xff) / 255.0f
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // REAL image codec — javax.imageio ships with the JDK (java.desktop
  // module): JPEG/PNG/BMP/GIF/TIFF readers and writers, pure-Java, no
  // native libraries. Only exotic/video container formats (MP4, WebP, …)
  // still need the FFI hop that `decodeStub` stands in for.
  // ---------------------------------------------------------------------

  final case class ImageStats(
      mediaId: Long,
      width: Int,
      height: Int,
      sumLuma: Long)

  /** Decode an image payload with the JDK's ImageIO readers. Returns None
    * when no registered reader recognises the bytes (e.g. a text payload
    * riding in a media column). */
  def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None; case _: RuntimeException => None }

  /** Deterministic grayscale test-pattern image (pixel (x,y) has value
    * `f(x,y) & 0xff`), written through the raster so no colorspace
    * conversion touches the values. */
  def grayImage(
      w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    img
  }

  /** Lossless PNG encode via ImageIO (the JDK PNG writer). */
  def encodePng(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image statistics: dimensions plus the EXACT integer sum of
    * luma samples (first band) — integer-exact, so a lossless
    * encode→decode roundtrip is hash-comparable across engines. */
  def imageStats(
      mediaId: Long, img: java.awt.image.BufferedImage): ImageStats = {
    val r = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    ImageStats(mediaId, w, h, sum)
  }

  final case class AHash(mediaId: Long, nAbove: Int, bits: String)

  /** 64-bit average hash (aHash) of a decoded image — the standard
    * perceptual fingerprint for image near-dedup: 8×8 block-average
    * downsample, threshold each block against the global block mean.
    * All-INTEGER arithmetic (floor divisions), so the hash is exactly
    * replayable from the pixel closed form by a SQL oracle; emitted as
    * a 64-char bit string (row-major blocks) plus the popcount. Blocks
    * use the x·8/w mapping (every block non-empty for w,h ≥ 8). */
  def aHash64(mediaId: Long, img: java.awt.image.BufferedImage): AHash = {
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val idx = by * 8 + x * 8 / w
        sums(idx) += r.getSample(x, y, 0)
        cnts(idx) += 1
        x += 1
      }
      y += 1
    }
    val avg = Array.tabulate(64)(i =>
      if (cnts(i) == 0) 0L else sums(i) / cnts(i))
    val mean = avg.sum / 64
    val sb = new StringBuilder(64)
    var nAbove = 0
    var i = 0
    while (i < 64) {
      if (avg(i) > mean) { sb.append('1'); nAbove += 1 }
      else sb.append('0')
      i += 1
    }
    AHash(mediaId, nAbove, sb.toString)
  }

  /** Image feature vector from a REAL decode: [0]=width, [1]=height,
    * [2]=mean luma in [0,1], [3..]=normalized luma histogram over
    * (dim-3) equal bins. None when the payload is not a decodable image. */
  def decodeImageFeatures(
      payload: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeImage(payload).map { img =>
      val r = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](dim)
      val bins = math.max(dim - 3, 0)
      val hist = new Array[Long](math.max(bins, 1))
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = r.getSample(x, y, 0)
          sum += v
          if (bins > 0) hist(math.min(v * bins / 256, bins - 1)) += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      if (dim > 0) out(0) = w.toFloat
      if (dim > 1) out(1) = h.toFloat
      if (dim > 2) out(2) = (sum / (255.0 * n)).toFloat
      var b = 0
      while (b < bins) { out(b + 3) = (hist(b) / n).toFloat; b += 1 }
      out
    }

  /** REAL image resize: decode, area-interpolated rescale through a
    * Graphics2D transform, re-encode as lossless PNG. Non-image payloads
    * pass through unchanged (the batch shape is 1→1 either way). */
  def resizeImageBytes(
      payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodeImage(payload).map { img =>
      val dst = new java.awt.image.BufferedImage(w, h, img.getType match {
        case 0 => java.awt.image.BufferedImage.TYPE_INT_RGB
        case t => t
      })
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      encodePng(dst)
    }.getOrElse(payload)

  /** Batch image decode + stats: the real-codec pipeline stage. Rows whose
    * payload no ImageIO reader recognises are dropped (count the drop rate
    * upstream if it matters — same contract as a production decode stage
    * quarantining corrupt files). */
  def extractImageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
      decodeImage(m.payload).map(img => imageStats(m.mediaId, img))))
  }

  // ---------------------------------------------------------------------
  // REAL video container codec — minimal RIFF/AVI with uncompressed DIB
  // ('DIB ', BI_RGB 24-bit) frames, written and parsed in pure JVM. This
  // is the standard uncompressed-AVI layout (RIFF('AVI ') → LIST(hdrl:
  // avih + LIST(strl: strh/strf)) → LIST(movi: 00db frames)); DIB rows
  // are bottom-up BGR with 4-byte stride padding. Lossless frames make
  // the decode EXACTLY invertible, so q_video_decode hash-compares frame
  // pixel sums against a DuckDB closed form.
  //
  // REAL COMPRESSED video codec — the same container with Motion-JPEG
  // ('MJPG') frames: each 00dc chunk holds a full baseline-JFIF stream
  // produced/consumed by the JDK's ImageIO JPEG codec (DCT +
  // quantization + Huffman — genuine lossy compression, pure JVM).
  // Decoded pixels are approximations, so MJPEG is spec-gated on PSNR /
  // structure / determinism rather than a DuckDB closed form. Inter-
  // frame-predicted codecs (H.264/MP4, VP9/WebM) remain the documented
  // FFI hop.
  // ---------------------------------------------------------------------

  final case class VideoStats(
      mediaId: Long,
      nFrames: Int,
      width: Int,
      height: Int,
      sumSampled: Long)

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def fourcc(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"), 0, 4)

  private def dibStride(w: Int): Int = (w * 3 + 3) & ~3

  /** Encode grayscale frames (pixel (x,y) of frame f = `px(f,x,y)&0xff`,
    * replicated to BGR) as an uncompressed-DIB AVI. */
  def encodeAviDib(w: Int, h: Int, nFrames: Int,
      px: (Int, Int, Int) => Int, fps: Int = 10): Array[Byte] = {
    val stride = dibStride(w)
    val frameBytes = stride * h
    def frame(f: Int): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val v = (px(f, x, y) & 0xff).toByte
          out(row + 3 * x) = v; out(row + 3 * x + 1) = v; out(row + 3 * x + 2) = v
          x += 1
        }
        y += 1
      }
      out
    }
    buildAvi(w, h, (0 until nFrames).map(frame), "00db", "DIB ",
      biCompression = 0, fps = fps)
  }

  /** Assemble a RIFF/AVI container around pre-encoded frame chunks —
    * shared by the uncompressed-DIB and Motion-JPEG writers. */
  private def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]],
      chunkId: String, handler: String, biCompression: Int,
      fps: Int): Array[Byte] = {
    val nFrames = frames.length
    val bufSize = if (frames.isEmpty) 0 else frames.map(_.length).max
    val b = new java.io.ByteArrayOutputStream()
    // movi list body first (to know sizes): 4 (listType) + chunks
    val moviBody = new java.io.ByteArrayOutputStream()
    fourcc(moviBody, "movi")
    frames.foreach { f =>
      fourcc(moviBody, chunkId); le32(moviBody, f.length)
      moviBody.write(f)
      if (f.length % 2 == 1) moviBody.write(0) // RIFF even padding
    }
    // strf = BITMAPINFOHEADER (40 bytes)
    val strf = new java.io.ByteArrayOutputStream()
    le32(strf, 40); le32(strf, w); le32(strf, h); le16(strf, 1); le16(strf, 24)
    le32(strf, biCompression); le32(strf, bufSize); le32(strf, 0); le32(strf, 0)
    le32(strf, 0); le32(strf, 0)
    // strh (56 bytes)
    val strh = new java.io.ByteArrayOutputStream()
    fourcc(strh, "vids"); fourcc(strh, handler)
    le32(strh, 0); le32(strh, 0); le32(strh, 0)
    le32(strh, 1); le32(strh, fps)               // scale / rate
    le32(strh, 0); le32(strh, nFrames); le32(strh, bufSize)
    le32(strh, -1); le32(strh, 0)
    le16(strh, 0); le16(strh, 0); le16(strh, w); le16(strh, h)
    // avih (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    le32(avih, 1000000 / fps); le32(avih, bufSize * fps); le32(avih, 0)
    le32(avih, 0); le32(avih, nFrames); le32(avih, 0); le32(avih, 1)
    le32(avih, bufSize); le32(avih, w); le32(avih, h)
    (0 until 4).foreach(_ => le32(avih, 0))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val c = new java.io.ByteArrayOutputStream()
      fourcc(c, id); le32(c, body.length); c.write(body)
      if (body.length % 2 == 1) c.write(0)
      c.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val c = new java.io.ByteArrayOutputStream()
      fourcc(c, "LIST"); le32(c, body.length + 4); fourcc(c, listType)
      c.write(body)
      c.toByteArray
    }
    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val moviChunk = {
      val body = moviBody.toByteArray
      val c = new java.io.ByteArrayOutputStream()
      fourcc(c, "LIST"); le32(c, body.length); c.write(body)
      c.toByteArray
    }
    val riffBody = hdrl ++ moviChunk
    fourcc(b, "RIFF"); le32(b, riffBody.length + 4); fourcc(b, "AVI ")
    b.write(riffBody)
    b.toByteArray
  }

  private def rdLe32(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
      ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
  private def rdCc(a: Array[Byte], o: Int): String =
    new String(a, o, 4, "US-ASCII")

  /** Parse an uncompressed-DIB AVI: (width, height, bottom-up BGR frame
    * payloads). None for anything that is not a RIFF/AVI container or
    * carries a compressed video stream. */
  def decodeAviDib(payload: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    if (payload.length < 12 || rdCc(payload, 0) != "RIFF" ||
      rdCc(payload, 8) != "AVI ") return None
    var w = 0
    var h = 0
    var compression = -1
    val frames = Vector.newBuilder[Array[Byte]]
    // walk chunks in [from, to); LIST bodies recurse
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = rdCc(payload, o)
        val size = rdLe32(payload, o + 4)
        // Long arithmetic: a crafted size near Int.MaxValue would wrap
        // o + 8 + size negative and bypass the bounds check
        if (size < 0 || o.toLong + 8L + size.toLong > to.toLong) return
        if (id == "LIST") walk(o + 12, o + 8 + size)
        else if (id == "strf" && size >= 40) {
          w = rdLe32(payload, o + 8 + 4)
          h = rdLe32(payload, o + 8 + 8)
          compression = rdLe32(payload, o + 8 + 16)
        } else if (id == "00db" || id == "00dc")
          frames += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + size)
        o += 8 + size + (size & 1)
      }
    }
    walk(12, payload.length)
    val fs = frames.result()
    // zero-frame containers are quarantined too: the frame-sampling
    // stats index frames(0), and an "AVI" with no video data is not a
    // decodable video under the drop/None contract
    if (w <= 0 || h <= 0 || compression != 0 || fs.isEmpty ||
      fs.exists(_.length < dibStride(w) * h)) None
    else Some((w, h, fs))
  }

  /** Pixel value (first/blue channel) at (x, y) of a bottom-up DIB frame. */
  def dibPixel(frame: Array[Byte], w: Int, h: Int, x: Int, y: Int): Int =
    frame((h - 1 - y) * dibStride(w) + 3 * x) & 0xff

  /** 'MJPG' as a little-endian BITMAPINFOHEADER biCompression value. */
  private val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Baseline-JFIF JPEG encode at an explicit quality via the JDK's
    * ImageIO JPEG writer (real DCT + quantization + Huffman). */
  def encodeJpeg(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Encode grayscale frames as a Motion-JPEG AVI: the `buildAvi`
    * container with each frame a complete JPEG stream in a 00dc chunk
    * (biCompression = 'MJPG'). Lossy — decoded pixels approximate
    * `px` (see the PSNR spec); frame COUNT, dimensions and byte
    * structure remain exact. */
  def encodeAviMjpeg(w: Int, h: Int, nFrames: Int,
      px: (Int, Int, Int) => Int, fps: Int = 10,
      quality: Float = 0.9f): Array[Byte] =
    buildAvi(w, h,
      (0 until nFrames).map(f =>
        encodeJpeg(grayImage(w, h, (x, y) => px(f, x, y)), quality)),
      "00dc", "MJPG", biCompression = MjpgFourcc, fps = fps)

  /** Decode a Motion-JPEG AVI: (width, height, decoded frames). None
    * when the payload is not a RIFF/AVI, the stream is not 'MJPG', or
    * any frame fails JPEG decode (whole-payload quarantine, matching
    * the other decoders' contract). */
  def decodeAviMjpeg(payload: Array[Byte])
      : Option[(Int, Int, Vector[java.awt.image.BufferedImage])] = {
    if (payload.length < 12 || rdCc(payload, 0) != "RIFF" ||
      rdCc(payload, 8) != "AVI ") return None
    var w = 0
    var h = 0
    var compression = -1
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = rdCc(payload, o)
        val size = rdLe32(payload, o + 4)
        // Long arithmetic: a crafted size near Int.MaxValue would wrap
        // o + 8 + size negative and bypass the bounds check
        if (size < 0 || o.toLong + 8L + size.toLong > to.toLong) return
        if (id == "LIST") walk(o + 12, o + 8 + size)
        else if (id == "strf" && size >= 40) {
          w = rdLe32(payload, o + 8 + 4)
          h = rdLe32(payload, o + 8 + 8)
          compression = rdLe32(payload, o + 8 + 16)
        } else if (id == "00dc")
          frames += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + size)
        o += 8 + size + (size & 1)
      }
    }
    walk(12, payload.length)
    val fs = frames.result()
    if (w <= 0 || h <= 0 || compression != MjpgFourcc || fs.isEmpty) None
    else {
      val decoded = fs.map(decodeImage)
      // a frame decoded SMALLER than the strf header's dimensions would
      // blow up the stats loop (it scans the header's w x h) — the
      // container is inconsistent, quarantine it like a failed decode
      if (decoded.exists(_.isEmpty) ||
        decoded.exists(d => d.get.getWidth < w || d.get.getHeight < h)) None
      else Some((w, h, decoded.map(_.get)))
    }
  }

  /** Frame-sampled stats over a Motion-JPEG AVI — same sampling
    * arithmetic as the DIB path, pixel sums over DECODED (approximate)
    * luma values. */
  def mjpegVideoStats(mediaId: Long, payload: Array[Byte],
      n: Int): Option[VideoStats] =
    decodeAviMjpeg(payload).map { case (w, h, frames) =>
      var sum = 0L
      val picked = (0 until n).map(i => (frames.length.toLong * i / n).toInt)
      picked.foreach { fi =>
        val r = frames(fi).getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
      }
      VideoStats(mediaId, frames.length, w, h, sum)
    }

  /** REAL video frame sampling + stats: decode the AVI, sample `n` evenly
    * spaced frames (the byte-slice sampler's index arithmetic, applied to
    * true frames), and sum their pixel values exactly. */
  def videoStats(mediaId: Long, payload: Array[Byte], n: Int): Option[VideoStats] =
    decodeAviDib(payload).map { case (w, h, frames) =>
      val stride = dibStride(w)
      var sum = 0L
      val picked = (0 until n).map(i => (frames.length.toLong * i / n).toInt)
      picked.foreach { fi =>
        val f = frames(fi)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) { sum += f(row + 3 * x) & 0xff; x += 1 }
          y += 1
        }
      }
      VideoStats(mediaId, frames.length, w, h, sum)
    }

  /** Batch video decode + frame-sampled stats; undecodable rows dropped
    * (same quarantine contract as the image/audio stages). */
  def extractVideoStats(media: Dataset[MediaRow], n: Int = 2): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => videoStats(m.mediaId, m.payload, n)))
  }

  // ---------------------------------------------------------------------
  // REAL audio codec — javax.sound.sampled (java.desktop ships WAV/AIFF/
  // AU container parsers and PCM converters, pure Java). The
  // q_audio_decode gate WAV-encodes a deterministic PCM16 waveform,
  // decodes it back through AudioSystem, and hash-compares exact integer
  // sample sums against a DuckDB closed form.
  // ---------------------------------------------------------------------

  final case class AudioStats(
      mediaId: Long,
      nFrames: Long,
      sampleRate: Int,
      sumPcm: Long)

  /** Encode signed 16-bit little-endian mono PCM as a WAV container. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode an audio container (WAV/AIFF/AU) to interleaved signed 16-bit
    * samples plus the declared sample rate. Non-PCM16 encodings are
    * converted through AudioSystem's format conversion; None when no
    * registered reader recognises the payload. */
  def decodeAudio(payload: Array[Byte]): Option[(Float, Array[Short])] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = raw.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      val in =
        if (f.matches(target)) raw
        else javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
      val bytes = in.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some((f.getSampleRate, out))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  final case class AudioWindow(mediaId: Long, win: Int, n: Int,
      sumSq: Long, peak: Int)

  /** Windowed audio energy from a REAL decode: fixed-size sample
    * windows (the last may be partial), each summarized by its exact
    * integer sum of squares (RMS² numerator — callers derive RMS) and
    * peak |amplitude|. Integer-exact, so silence/clipping detection
    * built on it is hash-comparable across engines. */
  def audioWindows(mediaId: Long, payload: Array[Byte],
      windowSize: Int): Seq[AudioWindow] =
    decodeAudio(payload).toSeq.flatMap { case (_, samples) =>
      samples.grouped(windowSize).zipWithIndex.map { case (w, idx) =>
        var sumSq = 0L
        var peak = 0
        var i = 0
        while (i < w.length) {
          val v = w(i).toInt
          sumSq += v.toLong * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        AudioWindow(mediaId, idx, w.length, sumSq, peak)
      }.toSeq
    }

  /** Audio decode + exact integer stats (the q_audio_decode gate shape). */
  def audioStats(mediaId: Long, payload: Array[Byte]): Option[AudioStats] =
    decodeAudio(payload).map { case (rate, samples) =>
      var sum = 0L
      var i = 0
      while (i < samples.length) { sum += samples(i); i += 1 }
      AudioStats(mediaId, samples.length.toLong, rate.toInt, sum)
    }

  /** Batch audio decode + stats over a media Dataset; undecodable rows
    * are dropped (same quarantine contract as extractImageStats). */
  def extractAudioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => audioStats(m.mediaId, m.payload)))
  }

  /** DSP features over REAL decoded audio: RMS, zero-crossing rate and
    * Goertzel band magnitudes on the [-1,1]-normalized samples — the same
    * spectral kernel as `decodeSignal`, fed by an actual container
    * decode instead of raw payload bytes. */
  def audioFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAudio(payload).map { case (_, samples) =>
      val x = new Array[Double](samples.length)
      var i = 0
      while (i < samples.length) { x(i) = samples(i) / 32768.0; i += 1 }
      signalFeatures(x, dim)
    }

  /** Real pure-JVM decoder: the payload as signed 8-bit PCM samples.
    * features(0) = RMS amplitude; features(1) = zero-crossing rate;
    * features(2..dim-1) = Goertzel magnitudes at dim-2 equally spaced
    * normalized frequencies w_k = pi*(k+1)/(dim-1) — a coarse spectrum.
    * Deterministic, allocation-light (one output array), O(dim * n). */
  private[pipeline] def decodeSignal(payload: Array[Byte], dim: Int): Array[Float] = {
    val x = new Array[Double](payload.length)
    var i = 0
    while (i < payload.length) { x(i) = payload(i).toDouble; i += 1 }
    signalFeatures(x, dim)
  }

  /** The shared DSP kernel behind `decodeSignal` (signed-8-bit payload
    * view) and `audioFeatures` (real container decode). */
  private[pipeline] def signalFeatures(x: Array[Double], dim: Int): Array[Float] = {
    val n = x.length
    val out = new Array[Float](dim)
    if (n == 0 || dim == 0) return out
    var prev = x(0)
    var sumSq = prev * prev
    var zc = 0
    var i = 1
    while (i < n) {
      val v = x(i)
      sumSq += v * v
      if ((v >= 0) != (prev >= 0)) zc += 1
      prev = v
      i += 1
    }
    out(0) = math.sqrt(sumSq / n).toFloat
    if (dim > 1) out(1) = zc.toFloat / math.max(n - 1, 1)
    var k = 0
    while (k < dim - 2) {
      val coeff = 2.0 * math.cos(math.Pi * (k + 1) / (dim - 1).toDouble)
      var s1 = 0.0
      var s2 = 0.0
      var j = 0
      while (j < n) {
        val s0 = x(j) + coeff * s1 - s2
        s2 = s1
        s1 = s0
        j += 1
      }
      val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
      out(k + 2) = (math.sqrt(math.max(power, 0.0)) / n).toFloat
      k += 1
    }
    out
  }

  private[pipeline] def checksum(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** Batch feature extraction: one pass per partition, rows processed in
    * order, constant memory beyond the current row. `decoder` selects the
    * real signal decoder (default) or the container-codec stub. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      decoder: (Array[Byte], Int) => Array[Float] = decodeSignal): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.payload.length,
          checksum(m.payload), decoder(m.payload, dim))
      }
    }
  }

  /** Modality-aware batch feature extraction: dispatch per row on the
    * declared `kind`, falling back to the raw-payload signal view when
    * the real codec rejects the payload (corrupt file, wrong label) —
    * rows are never dropped here, so the output stays 1:1 with the
    * input, and `checksum` still fingerprints the original bytes. */
  def extractFeaturesAuto(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val feats = m.kind match {
        case "image" => decodeImageFeatures(m.payload, dim)
        case "audio" => audioFeatures(m.payload, dim)
        case "video" => videoStats(m.mediaId, m.payload, n = 2).map { st =>
          val out = new Array[Float](dim)
          if (dim > 0) out(0) = st.width.toFloat
          if (dim > 1) out(1) = st.height.toFloat
          if (dim > 2) out(2) = st.nFrames.toFloat
          if (dim > 3) out(3) =
            (st.sumSampled / (255.0 * st.width * st.height * 2)).toFloat
          out
        }
        case _ => None
      }
      MediaFeatures(m.mediaId, m.kind, m.payload.length, checksum(m.payload),
        feats.getOrElse(decodeSignal(m.payload, dim)))
    })
  }

  /** Frame sampling: emit `n` evenly spaced "frames" (byte slices) per
    * payload — the video-pipeline shape (1→many explode inside the
    * partition, no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4, frameBytes: Int = 64): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = m.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = (len.toLong * i / n).toInt
        val end = math.min(off + frameBytes, len)
        FrameSample(m.mediaId, i, off,
          checksum(java.util.Arrays.copyOfRange(m.payload, off, end)))
      }
    }
  }

  /** "Resize": truncate/pad payload to a target byte budget — stands in
    * for image resize keeping the 1→1 batch shape. */
  def resizePayload(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    // copyOf both truncates (len >= target) and zero-pads (len < target)
    media.map(m => m.copy(payload =
      java.util.Arrays.copyOf(m.payload, targetBytes)))
  }
}
