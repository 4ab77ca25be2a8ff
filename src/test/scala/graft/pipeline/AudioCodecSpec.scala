package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The REAL audio codec path (javax.sound.sampled — no native libs):
  * WAV/AIFF container parse, PCM16 decode, spectral features over decoded
  * samples, and the distributed extractAudioStats stage. Like the image
  * codec, this is training-data-pipeline surface beyond the batch-only
  * reference.
  */
class AudioCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("WAV PCM16 roundtrip preserves exact samples, rate and count") {
    val samples = Array.tabulate(300)(i => (((i * 997) % 65536) - 32768).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 8000f)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    val (rate, back) = Multimodal.decodeAudio(wav).get
    assert(rate == 8000f)
    assert(back.sameElements(samples))
    val st = Multimodal.audioStats(5L, wav).get
    assert(st == Multimodal.AudioStats(5L, 300L, 8000, samples.map(_.toLong).sum))
  }

  test("AIFF container (big-endian) decodes through format conversion") {
    val samples = Array.tabulate(128)(i => (1000 * ((i % 4) - 2)).toShort)
    // AIFF stores big-endian PCM — the decode path must convert
    val pcm = new Array[Byte](256)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) >> 8).toByte
      pcm(2 * i + 1) = (samples(i) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, true)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 128L),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val (rate, back) = Multimodal.decodeAudio(bos.toByteArray).get
    assert(rate == 16000f)
    assert(back.sameElements(samples))
  }

  test("non-audio payloads return None, never throw") {
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAudio(
      Multimodal.encodePng(Multimodal.grayImage(4, 4, (_, _) => 0))).isEmpty)
  }

  test("audioFeatures: real spectral response on a decoded tone") {
    val dim = 10
    val m = 3 // bands k=0..7 at w_k = pi*(k+1)/9
    val w = math.Pi * (m + 1) / (dim - 1).toDouble
    val samples = Array.tabulate(1024)(j =>
      (16000 * math.cos(w * j)).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 8000f)
    val f = Multimodal.audioFeatures(wav, dim).get
    val bands = (2 until dim).map(i => f(i))
    val others = bands.zipWithIndex.filter(_._2 != m).map(_._1)
    assert(bands(m) > 3 * others.max,
      s"tone energy not concentrated: ${bands.mkString(",")}")
    // RMS of a +-0.488 full-scale sine ~ 0.488/sqrt(2)
    assert(math.abs(f(0) - 16000.0 / 32768.0 / math.sqrt(2)) < 0.02)
    assert(Multimodal.audioFeatures("garbage".getBytes, dim).isEmpty)
  }

  test("extractAudioStats runs distributed and drops undecodable rows") {
    import spark.implicits._
    val rows = (0L until 12L).map { id =>
      if (id % 4 == 3)
        Multimodal.MediaRow(id, "audio", s"corrupt-$id".getBytes, 0, 0)
      else {
        val n = 64 + id.toInt
        Multimodal.MediaRow(id, "audio",
          Multimodal.encodeWavPcm16(
            Array.tabulate(n)(i => ((i * 31 + id) % 8192).toShort), 8000f), 0, 0)
      }
    }
    val out = Multimodal.extractAudioStats(
      spark.createDataset(rows).repartition(3)).collect().sortBy(_.mediaId)
    assert(out.length == 9)
    assert(out.forall(s => s.nFrames == 64 + s.mediaId && s.sampleRate == 8000))
    val id1 = out.find(_.mediaId == 1L).get
    assert(id1.sumPcm == (0 until 65).map(i => (i * 31 + 1) % 8192).sum.toLong)
  }
}
