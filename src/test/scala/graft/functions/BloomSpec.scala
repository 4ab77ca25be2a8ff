package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The bloom membership expression's SQL surface and typing contract. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom_might_contain_long via SQL with a binary literal filter") {
    val bytes = Bloom.buildLong(
      spark.range(100).toDF("id"), "id", 100L, 0.01)
    Bloom.register(spark)
    val hex = bytes.map("%02X".format(_)).mkString
    val hits = spark.sql(
      s"""SELECT count(*) AS n FROM range(1000)
         |WHERE bloom_might_contain_long(X'$hex', id)""".stripMargin)
      .as[Long].head()
    assert(hits >= 100L, s"false negatives: only $hits of 100 members hit")
    assert(hits <= 150L, s"fp rate blown: $hits hits of 1000 probes")
  }

  test("strict typing: non-bigint key fails analysis, not silently") {
    val bytes = Bloom.buildLong(spark.range(10).toDF("id"), "id", 10L, 0.01)
    val df = Seq("abc").toDF("s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Bloom.might_contain_long(bytes, col("s"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }
}
