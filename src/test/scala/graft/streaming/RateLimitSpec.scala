package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RateLimitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, us: Long, uid: Long) =
    EventStreams.MetricEvent(uid, us, id, 1.0)

  test("admits earliest-by-(ts,id) up to the cap; count carries across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.MetricEvent]
    val limited = EventStreams.streamingRateLimit(mem.toDS(),
      windowUs = 100L, maxPerWindow = 2)
    val q = limited.writeStream.outputMode("append")
      .format("memory").queryName("rate_limit_spec").start()
    try {
      // batch 1, window [0,100): user 1 sends 3 (out of order) → 2 kept,
      // and the EARLIEST two by (ts, id) at that
      mem.addData(ev(11, 50, 1L), ev(10, 10, 1L), ev(12, 30, 1L))
      q.processAllAvailable()
      // batch 2, same window: count is already 2 → everything dropped
      mem.addData(ev(13, 70, 1L), ev(14, 80, 1L))
      q.processAllAvailable()
      // batch 3: next window admits afresh; another user unaffected
      mem.addData(ev(15, 120, 1L), ev(16, 40, 2L))
      q.processAllAvailable()
      val kept = spark.table("rate_limit_spec")
        .select("event_id").as[Long].collect().toSet
      assert(kept == Set(10L, 12L, 15L, 16L),
        s"expected earliest-2 then cross-batch saturation, got $kept")
    } finally q.stop()
  }

  test("welford state is split-invariant across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.MetricEvent]
    val q = EventStreams.streamingWelford(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("welford_spec").start()
    val xs = Seq(3.25, 1.5, 7.0, 2.0, 9.75, 4.0)
    try {
      // two arbitrary batch splits; the carried (n, mean, M2) must
      // converge to the one-pass fold bitwise
      mem.addData(xs.take(2).zipWithIndex.map { case (v, i) =>
        EventStreams.MetricEvent(1L, i.toLong, i.toLong, v) }: _*)
      q.processAllAvailable()
      mem.addData(xs.drop(2).zipWithIndex.map { case (v, i) =>
        EventStreams.MetricEvent(1L, (i + 2).toLong, (i + 2).toLong, v) }: _*)
      q.processAllAvailable()
      val rows = spark.table("welford_spec")
        .orderBy(org.apache.spark.sql.functions.col("n").desc)
        .as[(Long, Long, Double, Double)].collect()
      val one = EventStreams.foldWelford(
        EventStreams.WelfordState(0L, 0.0, 0.0), xs.iterator)
      assert(rows.head == ((1L, 6L, one.mean, one.m2)),
        s"split fold ${rows.head} != one-pass $one")
      val mean = xs.sum / xs.size
      assert(math.abs(one.mean - mean) < 1e-12)
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum
      assert(math.abs(one.m2 - m2) < 1e-9)
    } finally q.stop()
  }

  test("transition state chains across micro-batch boundaries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.TransitionEvent]
    val q = EventStreams.streamingTransitions(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_spec").start()
    def ev(us: Long, id: Long, t: String) =
      EventStreams.TransitionEvent(1L, us, id, t)
    try {
      mem.addData(ev(10, 1, "a"), ev(20, 2, "b"))
      q.processAllAvailable()
      // the cross-batch pair (b -> c) exists ONLY via carried state
      mem.addData(ev(30, 3, "c"), ev(40, 4, "a"))
      q.processAllAvailable()
      val got = spark.table("trans_spec")
        .as[(String, String)].collect().toSeq.sorted
      assert(got == Seq(("a", "b"), ("b", "c"), ("c", "a")),
        s"expected chained transitions, got $got")
    } finally q.stop()
  }

  test("ties on ts admit the smaller event_id") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.MetricEvent]
    val limited = EventStreams.streamingRateLimit(mem.toDS(),
      windowUs = 1000L, maxPerWindow = 1)
    val q = limited.writeStream.outputMode("append")
      .format("memory").queryName("rate_limit_tie_spec").start()
    try {
      mem.addData(ev(21, 5, 1L), ev(20, 5, 1L))
      q.processAllAvailable()
      val kept = spark.table("rate_limit_tie_spec")
        .select("event_id").as[Long].collect().toSet
      assert(kept == Set(20L), s"tie must break to smaller id: $kept")
    } finally q.stop()
  }
}
