package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode/feature-extract/
  * frame-sample run batch-wise inside mapPartitions over a typed Dataset
  * (the Scala analog of `mapInPandas` — one JVM-side batch loop, arbitrary
  * native calls inside, schema declared up front).
  *
  * Feature extraction is REAL signal processing: `decodeSignal` treats
  * the payload as signed 8-bit PCM and computes RMS, zero-crossing rate
  * and Goertzel spectral-band energies — pure-JVM DSP that responds to
  * actual signal structure (pure tones concentrate in the matching band;
  * see the spec). What stays out of scope in this container is
  * CONTAINER-FORMAT parsing (JPEG/MP4 entropy decode needs a native
  * codec); `decodeStub` remains as the placeholder for that hop, and the
  * Spark-side contract — schema, batching, partition sizing, skew
  * behavior — is identical either way.
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

  /** Real pure-JVM decoder: the payload as signed 8-bit PCM samples.
    * features(0) = RMS amplitude; features(1) = zero-crossing rate;
    * features(2..dim-1) = Goertzel magnitudes at dim-2 equally spaced
    * normalized frequencies w_k = pi*(k+1)/(dim-1) — a coarse spectrum.
    * Deterministic, allocation-light (one output array), O(dim * n). */
  private[pipeline] def decodeSignal(payload: Array[Byte], dim: Int): Array[Float] = {
    val n = payload.length
    val out = new Array[Float](dim)
    if (n == 0 || dim == 0) return out
    var prev = payload(0).toDouble
    var sumSq = prev * prev
    var zc = 0
    var i = 1
    while (i < n) {
      val x = payload(i).toDouble
      sumSq += x * x
      if ((x >= 0) != (prev >= 0)) zc += 1
      prev = x
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
        val s0 = payload(j).toDouble + coeff * s1 - s2
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
