package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks latest right row at-or-before, null when none") {
    val left = Seq(
      (1L, 100L, 5L),   // key 1: before any right row  -> null
      (2L, 100L, 15L),  // key 1: right@10 applies
      (3L, 100L, 20L),  // key 1: right@20 ties -> included (at-or-before)
      (4L, 100L, 99L),  // key 1: latest right@30
      (5L, 200L, 50L),  // key 2: no right rows at all  -> null
      (6L, 100L, 20L)   // same (key, ts) as row 3 -> same answer
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0), (100L, 30L, 3.0)
    ).toDF("k", "t", "v")

    val out = AsOfJoin.asOfJoin(left, right, "k", "t", "v")
      .select("id", "asof_v").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(1.0))
    assert(out(3L).contains(2.0))
    assert(out(4L).contains(3.0))
    assert(out(5L).isEmpty)
    assert(out(6L).contains(2.0))
  }

  test("a right row with NULL value still wins over older rows") {
    // DuckDB ASOF JOIN semantics: the MOST RECENT at-or-before row
    // matches even if its value column is NULL — row presence, not value
    // nullability, drives the window.
    val left = Seq((1L, 100L, 25L)).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, Some(1.0)), (100L, 20L, None: Option[Double])
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOfJoin(left, right, "k", "t", "v")
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty, "the newer NULL-valued right row must win")
  }

  test("reserved internal column names are rejected up front") {
    val left = Seq((1L, 1L, 1L)).toDF("__side", "k", "t")
    val right = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(left, right, "k", "t", "v")
    }
    assert(e.getMessage.contains("__side"))
  }
}
