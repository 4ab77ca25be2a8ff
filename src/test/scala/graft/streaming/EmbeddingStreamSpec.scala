package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.VectorOps

/** Streaming embedding near-dup: cross-batch bucket state and parity
  * with the batch hyperplane-LSH operator. */
class EmbeddingStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("embedding matcher pairs across micro-batches via bucket state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val buckets = DocStreams.vecBuckets(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      bits = 10, probes = 40)
    val q = DocStreams.embeddingMatcher(buckets, minCosine = 0.9).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("emb_stream_test").start()
    val base = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
    val ortho = Array.tabulate(64)(i => (if (i % 2 == 0) 1f else -1f) *
      math.cos(i * 1.3).toFloat)
    val near = base.clone(); near(7) = 0f; near(39) = 0f
    try {
      // batch 1: two dissimilar vectors — no pairs yet
      mem.addData((1L, base), (2L, ortho))
      q.processAllAvailable()
      assert(spark.table("emb_stream_test").isEmpty)
      // batch 2: a near-copy of vector 1 arrives LATER — only bucket
      // state can pair it with vector 1
      mem.addData((3L, near))
      q.processAllAvailable()
      val out = spark.table("emb_stream_test")
        .select("a", "b").distinct().as[(Long, Long)].collect().toSet
      assert(out.contains((1L, 3L)), s"cross-batch pair missing: $out")
      assert(!out.exists(p => p._1 == 2L || p._2 == 2L), s"false pair: $out")
      // batch 3: an exact twin of vector 3 — state has accumulated both
      // similar vectors, so it must pair with 1 AND 3 (cosine 1.0 / 0.9+)
      mem.addData((4L, near.clone()))
      q.processAllAvailable()
      val out2 = spark.table("emb_stream_test")
        .select("a", "b").distinct().as[(Long, Long)].collect().toSet
      assert(out2.contains((1L, 4L)) && out2.contains((3L, 4L)),
        s"third arrival must pair with all remembered members: $out2")
    } finally q.stop()
  }

  test("drain-once runner equals the batch lshNeighborPairs answer") {
    val dir = "/root/testdata/sf0.001"
    val q = DocStreams.runStreamingEmbeddingDedupOnce(spark, dir,
      "emb_stream_parity")
    assert(q.awaitTermination(120000), "streaming drain timed out")
    val streamed = spark.table("emb_stream_parity")
      .select("a", "b", "cosine").distinct()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 7 || i === 39, lit(0.0f)).otherwise(x))
          .as("embedding"))
    val batch = VectorOps.lshNeighborPairs(emb.unionAll(planted),
      "vec_id", "embedding", bits = 10, minCosine = 0.9, probes = 20)
      .select(col("a"), col("b"), col("cosine"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
