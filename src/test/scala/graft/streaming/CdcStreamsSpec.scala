package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.streaming.CdcStreams.OrderChange

class CdcStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Latest row per key currently visible in the Update-mode memory
    * sink: later batches re-emit a key with a higher version, so the
    * max-version row per key is the converged state. */
  private def converged(table: String): Map[Long, OrderChange] =
    spark.table(table).as[OrderChange].collect()
      .groupBy(_.o_orderkey)
      .map { case (k, rows) => k -> rows.maxBy(_.version) }

  test("state carries across micro-batches: update, delete, stale straggler") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[OrderChange]
    val q = CdcStreams.latestPerKey[OrderChange](
        mem.toDS(), _.o_orderkey, _.version)
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_test").start()
    try {
      // batch 1: initial snapshot of three keys
      mem.addData(
        OrderChange(1L, "a", 10L, 0L, "U"),
        OrderChange(2L, "b", 20L, 0L, "U"),
        OrderChange(3L, "c", 30L, 0L, "U"))
      q.processAllAvailable()
      // batch 2: update k1, delete k2 — state from batch 1 must be live
      mem.addData(
        OrderChange(1L, "a2", 11L, 2L, "U"),
        OrderChange(2L, "b", 20L, 1L, "D"))
      q.processAllAvailable()
      // batch 3: stale straggler for k1 (version 1 < held 2) — ignored
      mem.addData(OrderChange(1L, "old", 99L, 1L, "U"))
      q.processAllAvailable()
      val state = converged("cdc_test")
      assert(state(1L) === OrderChange(1L, "a2", 11L, 2L, "U"))
      assert(state(2L).op === "D")          // tombstone retained
      assert(state(3L) === OrderChange(3L, "c", 30L, 0L, "U"))
    } finally q.stop()
  }

  test("drain-once runner converges to the batch merge result") {
    val dir = "/root/testdata/sf0.001"
    val q = CdcStreams.runStreamingMergeOnce(spark, dir, "cdc_drain_test")
    q.awaitTermination(120000)
    val streamed = spark.table("cdc_drain_test")
      .filter(col("op") =!= "D")
      .select("o_orderkey", "status", "price_c")
      .as[(Long, String, Long)].collect().toSet
    val snap = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val del = snap.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("status"), col("price_c"),
        lit(1L).as("version"), lit("D").as("op"))
    val upd = snap
      .filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), lit("UPD").as("status"),
        (col("price_c") + 110).as("price_c"),
        lit(1L).as("version"), lit("U").as("op"))
    val ins = snap.filter(col("o_orderkey") % 11 === 0)
      .select((col("o_orderkey") + 3000000L).as("o_orderkey"),
        lit("NEW").as("status"), (col("price_c") + 100).as("price_c"),
        lit(1L).as("version"), lit("U").as("op"))
    val batch = graft.operators.Merge.mergeLatest(snap,
        del.unionByName(upd).unionByName(ins),
        Seq("o_orderkey"), "version", "op")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
  }
}
