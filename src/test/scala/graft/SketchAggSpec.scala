package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY §2.4 "absent in reference: HLL sketches —
  * free via Catalyst"): approximate distinct counts and quantiles are the
  * aggregation scale path when exact answers would shuffle every distinct
  * value. No DuckDB oracle is possible (different sketch impls), so the
  * guarantee tested is the error bound against the exact answer. */
class SketchAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val o = Tables.load(spark, dir, "orders")
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile within 1% relative error of exact median") {
    val l = Tables.load(spark, dir, "lineitem")
    val r = l.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }
}
