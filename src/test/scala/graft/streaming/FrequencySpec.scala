package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sharded SpaceSaving heavy hitters: kernel semantics (exactness under
  * capacity, bounded memory + overestimation on overflow) and
  * cross-batch streaming state. */
class FrequencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sketch is exact when capacity covers the key universe") {
    val m = Frequency.updateSketch(Map.empty,
      Iterator(1L, 2L, 1L, 3L, 1L, 2L), capacity = 10)
    assert(m == Map(1L -> (3L, 0L), 2L -> (2L, 0L), 3L -> (1L, 0L)))
  }

  test("overflow surrenders the min counter with the classic error bound") {
    // capacity 2: keys 1 (x5), 2 (x2) hold counters; key 3 arrives
    val m0 = Frequency.updateSketch(Map.empty,
      Iterator(1L, 1L, 1L, 1L, 1L, 2L, 2L), capacity = 2)
    val m1 = Frequency.updateSketch(m0, Iterator(3L), capacity = 2)
    assert(m1.size == 2)               // state stays bounded
    assert(m1(1L) == (5L, 0L))         // the heavy key is untouched
    assert(m1(3L) == (3L, 2L))         // inherited min count, err = 2
    assert(!m1.contains(2L))
    // true count of 3 is 1; estimate 3 with err 2 → n - err <= true <= n
    val (n, e) = m1(3L)
    assert(n - e <= 1 && 1 <= n)
  }

  test("streaming sketch accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = Frequency.spaceSavingSketch(mem.toDS(), shards = 4,
        capacity = 100).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("freq_stream_test").start()
    try {
      mem.addData(1L, 1L, 2L)
      q.processAllAvailable()
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val last = Frequency.latestCounters(spark.table("freq_stream_test"))
        .select("key", "n").as[(Long, Long)].collect().toMap
      assert(last == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    } finally q.stop()
  }

  test("latest-snapshot read does not resurrect evicted keys") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    // one shard, capacity 2: batch 1 installs {1:x2, 2:x1}; batch 2's
    // key 3 evicts the min counter (key 2). A max(n)-per-key read of the
    // Append snapshots would resurrect key 2 from the batch-1 snapshot.
    val q = Frequency.spaceSavingSketch(mem.toDS(), shards = 1,
        capacity = 2).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("freq_evict_test").start()
    try {
      mem.addData(1L, 1L, 2L)
      q.processAllAvailable()
      mem.addData(3L)
      q.processAllAvailable()
      val last = Frequency.latestCounters(spark.table("freq_evict_test"))
        .select("key", "n").as[(Long, Long)].collect().toMap
      assert(last.keySet == Set(1L, 3L), s"got $last")
      assert(last(3L) == 2L) // inherited min count
      // the stale snapshot IS in the raw table — only the latest read drops it
      assert(spark.table("freq_evict_test").filter($"key" === 2L).count() == 1)
    } finally q.stop()
  }

  test("drained top-k equals batch GROUP BY on the events table") {
    import org.apache.spark.sql.functions._
    val q = Frequency.runStreamingTopUsersOnce(spark,
      "/root/testdata/sf0.001", "freq_topk_spec")
    q.awaitTermination(120000)
    val streamed = Frequency.latestCounters(spark.table("freq_topk_spec"))
      .select(col("key").as("user_id"), col("n"))
    val batch = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
