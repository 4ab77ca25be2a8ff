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

  test("sketch kernels match their column-algebra forms on NULL-bearing arrays") {
    import spark.implicits._
    // minhash: xxhash64(lit(i), NULL) skips the null CHILD, not the
    // row — the algebra folds hashInt(i, 42) for a null slot, and the
    // kernel must reproduce that bitwise
    val df = Seq(
      (1L, Seq[java.lang.Long](7L, null, 42L)),
      (2L, Seq[java.lang.Long](null)),
      (3L, Seq[java.lang.Long](5L, 6L)))
      .toDF("id", "hs")
    val n = 8
    val algebra = array((0 until n).map(i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h)))): _*)
    val both = df.select(col("id"),
      graft.functions.Sketches.minhash_sig(col("hs"), n).as("kernel"),
      algebra.as("algebra")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"minhash null-slot divergence at id ${r.getLong(0)}")
    }

    // hyperplane: a null element nulls every projection in the algebra
    // (when(NULL > 0) is false), so the signature is 0 — the kernel
    // must not read the null slot's storage as a garbage float
    val vdf = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (2L, Seq[java.lang.Float](1.0f, -2.0f, 3.0f)))
      .toDF("id", "v")
    val got = vdf.select(col("id"),
      graft.functions.Sketches.hyperplane_sig(col("v"), 16, 0).as("k"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L, "null element must zero the signature")
    assert(got(2L) != 0L)
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
