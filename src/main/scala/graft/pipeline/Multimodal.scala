package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode/feature-extract/
  * frame-sample run batch-wise inside mapPartitions over a typed Dataset
  * (the Scala analog of `mapInPandas` — one JVM-side batch loop, arbitrary
  * native calls inside, schema declared up front).
  *
  * The actual codec calls are STUBBED (this container ships no image/audio
  * libraries): `decodeStub` produces deterministic fake features from the
  * bytes. The Spark-side contract — schema, batching, partition sizing,
  * skew behavior — is real and tested; swap `decodeStub` for a JNI/FFI
  * codec to productionize.
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
    * order, constant memory beyond the current row. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.payload.length,
          checksum(m.payload), decodeStub(m.payload, dim))
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
