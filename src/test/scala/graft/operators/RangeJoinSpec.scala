package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("banded interval join equals the nested-loop answer") {
    // intervals of varied lengths crossing band boundaries; left points on
    // boundaries, inside, outside
    val left = (0L until 50L).map(i => (i, ts(i * 600L * 1000000L)))
      .toDF("id", "t")
    val right = Seq(
      (100L, ts(0L), ts(3600L * 1000000L)),                    // 1h from epoch
      (101L, ts(1800L * 1000000L), ts(1800L * 1000000L + 1L)), // 1µs window
      (102L, ts(7200L * 1000000L), ts(36000L * 1000000L))      // 8h
    ).toDF("rid", "s", "e")

    val banded = RangeJoin
      .bandedIntervalJoin(left, "t", right, "s", "e", bandMicros = 1800L * 1000000L)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val nested = left.join(right, col("t") >= col("s") && col("t") < col("e"))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(banded == nested)
    assert(banded.contains((0L, 100L)))    // start boundary included
    assert(!banded.exists(_._2 == 101L))   // 1µs window catches no grid point
    assert(!banded.contains((6L, 100L)))   // end boundary excluded (3600s)
  }

  test("banded interval join accepts TIMESTAMP_NTZ inputs (no-timezone parquet flavor)") {
    import org.apache.spark.sql.types.TimestampNTZType
    val left = (0L until 50L).map(i => (i, ts(i * 600L * 1000000L)))
      .toDF("id", "t").withColumn("t", col("t").cast(TimestampNTZType))
    val right = Seq(
      (100L, ts(0L), ts(3600L * 1000000L)),
      (102L, ts(7200L * 1000000L), ts(36000L * 1000000L))
    ).toDF("rid", "s", "e")
      .withColumn("s", col("s").cast(TimestampNTZType))
      .withColumn("e", col("e").cast(TimestampNTZType))
    val banded = RangeJoin
      .bandedIntervalJoin(left, "t", right, "s", "e", bandMicros = 1800L * 1000000L)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val nested = left.join(right, col("t") >= col("s") && col("t") < col("e"))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(banded == nested && banded.nonEmpty)
  }

  test("banded overlap join equals the nested-loop overlap on random intervals") {
    val rnd = new java.util.Random(13)
    val us = 1000000L
    val left = (0 until 120).map { i =>
      val s = rnd.nextInt(100000).toLong * us
      (i.toLong, s, s + (1 + rnd.nextInt(5000)) * us)
    }.toDF("lid", "ls", "le")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(100000).toLong * us
      (i.toLong, s, s + (1 + rnd.nextInt(3000)) * us)
    }.toDF("rid", "rs", "re")
    val banded = RangeJoin.bandedOverlapJoin(left, "ls", "le",
        right, "rs", "re", bandMicros = 2000L * us)
      .select("lid", "rid").as[(Long, Long)].collect()
    val nested = left.join(right,
        col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(banded.length == nested.length,
      s"first-band dedupe must emit each pair once: " +
        s"${banded.length} vs ${nested.length}")
    assert(banded.toSet == nested.toSet && banded.nonEmpty)
  }

  test("overlap join: touching endpoints are half-open (no match)") {
    val us = 1000000L
    val left = Seq((1L, 0L, 100L * us)).toDF("lid", "ls", "le")
    val right = Seq((2L, 100L * us, 200L * us), (3L, 99L * us, 200L * us))
      .toDF("rid", "rs", "re")
    val out = RangeJoin.bandedOverlapJoin(left, "ls", "le",
        right, "rs", "re", bandMicros = 50L * us)
      .select("rid").as[Long].collect().toSet
    assert(out == Set(3L), "[0,100) must not overlap [100,200)")
  }

  test("banded interval join accepts raw long-micros columns") {
    val left = (0L until 50L).map(i => (i, i * 600L * 1000000L)).toDF("id", "t")
    val right = Seq(
      (100L, 0L, 3600L * 1000000L),
      (102L, 7200L * 1000000L, 36000L * 1000000L)).toDF("rid", "s", "e")
    val banded = RangeJoin
      .bandedIntervalJoin(left, "t", right, "s", "e", bandMicros = 1800L * 1000000L)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val nested = left.join(right, col("t") >= col("s") && col("t") < col("e"))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(banded == nested && banded.nonEmpty)
  }
}
