package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The timestamp-flavor normalization contract (tables.scala): a lake
  * accumulates parquet event-time columns as nanos-long, TIMESTAMP_NTZ
  * and UTC-adjusted micros — every flavor must normalize to the SAME
  * TimestampType instants under the session-UTC convention. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // one instant, three representations
  private val micros = 1723500000123456L // 2024-08-12T21:20:00.123456Z

  test("normalizeEventTime: UTC-micros timestamps pass through untouched") {
    import spark.implicits._
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val out = Tables.normalizeEventTime(df, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("normalizeEventTime: TIMESTAMP_NTZ casts losslessly under session UTC") {
    import spark.implicits._
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventTime(df, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("normalizeEventTime: legacy nanos-long truncates to the same micros") {
    import spark.implicits._
    // nanos with sub-micro residue — truncation (not rounding) is the
    // DuckDB-parity behavior
    val df = Seq(micros * 1000L + 789L).toDF("ts")
    val out = Tables.normalizeEventTime(df, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("normalizeNtz converts every NTZ column and leaves the rest alone") {
    import spark.implicits._
    val df = Seq((1L, micros)).toDF("id", "us")
      .select(col("id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("a"),
        timestamp_micros(col("us")).as("b"))
    val out = Tables.normalizeNtz(df)
    assert(out.schema("a").dataType == TimestampType)
    assert(out.schema("b").dataType == TimestampType)
    assert(out.schema("id").dataType == LongType)
    assert(out.select(unix_micros(col("a"))).as[Long].head() == micros)
  }

  test("load normalizes the events table to TimestampType at every SF") {
    for (sf <- Seq("0.001", "0.01")) {
      val ev = Tables.load(spark, s"/root/testdata/sf$sf", "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"sf$sf ts is ${ev.schema("ts").dataType}")
    }
    // the date-carrying relational tables normalize too (they shipped
    // as NTZ in some testdata generations)
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.schema("l_shipdate").dataType == TimestampType)
  }
}
