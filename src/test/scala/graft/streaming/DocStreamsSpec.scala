package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Dedup

/** Streaming SimHash near-dup: cross-batch state, parity with the batch
  * operator, and signature-only state semantics. */
class DocStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matcher finds pairs across micro-batches via bucket state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val chunks = DocStreams.simHashChunks(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = DocStreams.simHashMatcher(chunks, maxHamming = 6).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("simhash_stream_test").start()
    val text = "the quick brown fox jumps over the lazy dog again and again"
    try {
      // batch 1: two unrelated docs — no pairs yet
      mem.addData((1L, text), (2L, "completely different words here nothing alike at all"))
      q.processAllAvailable()
      assert(spark.table("simhash_stream_test").isEmpty)
      // batch 2: a near-copy of doc 1 arrives LATER — only bucket state
      // can pair it with doc 1
      mem.addData((3L, text + " tail"))
      q.processAllAvailable()
      val out = spark.table("simhash_stream_test")
        .select("a", "b").distinct().as[(Long, Long)].collect().toSet
      assert(out.contains((1L, 3L)), s"cross-batch pair missing: $out")
      assert(!out.exists(p => p._1 == 2L || p._2 == 2L), s"false pair: $out")
      // batch 3: a signature-twin of doc 3 (same text) — state has
      // accumulated both earlier docs, so it must pair with doc 3
      // (Hamming 0) AND doc 1 (same distance doc 3 had)
      mem.addData((4L, text + " tail"))
      q.processAllAvailable()
      val out2 = spark.table("simhash_stream_test")
        .select("a", "b").distinct().as[(Long, Long)].collect().toSet
      assert(out2.contains((1L, 4L)) && out2.contains((3L, 4L)),
        s"third arrival must pair with all remembered members: $out2")
    } finally q.stop()
  }

  test("auto chunk blocking guarantees recall at the boundary distance") {
    import spark.implicits._
    // a hamming-4 pair whose differing bits land in all four 16-bit
    // chunks — exactly the pair 4-chunk blocking is allowed to miss.
    // The shared auto rule (maxHamming 4 -> 8 x 8-bit chunks) must find
    // it in BOTH the batch operator and the streaming matcher.
    val a = 0L
    val b = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    val sigs = Seq((1L, a), (2L, b)).toDF("docId", "sig")
    assert(Dedup.simHashPairsFromSigs(sigs, maxHamming = 4, numChunks = 4)
      .isEmpty, "adversarial pair unexpectedly found under 4-chunk blocking")
    assert(Dedup.simHashPairsFromSigs(sigs, maxHamming = 4)
      .as[(Long, Long, Int)].collect().toSet == Set((1L, 2L, 4)))
    val chunks = Seq(1L -> a, 2L -> b).flatMap { case (id, s) =>
      (0 until 8).map(c =>
        DocStreams.ChunkRow(id, s, c, (s >>> (c * 8)) & 0xffL))
    }.toDS()
    val hits = DocStreams.simHashMatcher(chunks, maxHamming = 4)
      .toDF().select("a", "b", "hamming").distinct()
      .as[(Long, Long, Int)].collect().toSet
    assert(hits == Set((1L, 2L, 4)))
  }

  test("drain-once runner equals the batch simHashPairs answer") {
    val dir = "/root/testdata/sf0.001"
    val q = DocStreams.runStreamingSimHashDedupOnce(spark, dir,
      "simhash_stream_parity", maxHamming = 6)
    q.awaitTermination(120000)
    val streamed = spark.table("simhash_stream_parity")
      .select("a", "b", "hamming").distinct()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionAll(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(10))).as("text")))
    val batch = Dedup.simHashPairs(planted, "doc_id", "text",
      maxHamming = 6, hashFn = Dedup.md5Long)

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("stateless streaming mixture sample equals the batch sample") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val weights = Map("src0" -> 1.0, "src2" -> 0.5, "src4" -> 0.25)
    val q = DocStreams.runStreamingMixtureOnce(spark, dir,
      "mixture_stream_parity", weights, defaultWeight = 0.1)
    q.awaitTermination(120000)
    val streamed = spark.table("mixture_stream_parity").select("doc_id")
    val batch = graft.pipeline.Sampling.mixtureSample(
        spark.read.parquet(s"$dir/documents.parquet"),
        "source", "doc_id", weights, defaultWeight = 0.1)
      .select("doc_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("streaming BPE token counts equal the batch tokenizer") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.pipeline.Bpe.learnMerges(docs, "text", 10)
    val q = DocStreams.runStreamingBpeCountsOnce(spark, dir,
      "bpe_stream_parity", model.merges.map(m => (m.lhs, m.rhs)))
    q.awaitTermination(120000)
    val streamed = spark.table("bpe_stream_parity")
      .select("doc_id", "n_words", "n_bpe_tokens")
    val batch = graft.pipeline.Bpe.tokenCounts(docs, "doc_id", "text",
      model)
    assert(streamed.count() > 0)
    // the compiled expression must replay the trained symbol table
    // exactly — set equality on all three columns
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
