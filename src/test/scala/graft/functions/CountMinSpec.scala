package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 256

  test("estimates never undercount and are exact when buckets are sparse") {
    // 50 distinct keys across 256 buckets x 4 rows: min-over-rows is
    // almost surely collision-free; every estimate must be >= exact and
    // the total overcount tiny
    val data = (0 until 1000).map(i => (i % 50).toLong).toDF("k")
    val sketch = data.agg(CountMin.cms_sketch(col("k"), depth, width)
      .as("cms"))
    val out = data.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("exact"),
        CountMin.estimate(col("cms"), col("k"), depth, width).as("est"))
      .as[(Long, Long, Long)].collect()
    assert(out.length == 50)
    assert(out.forall { case (_, exact, est) => est >= exact },
      "CMS must never undercount")
    assert(out.count { case (_, exact, est) => est == exact } >= 45,
      "sparse sketch should be exact for almost all keys")
  }

  test("merge across partitions equals a single-partition build") {
    val data = (0 until 5000).map(i => (i % 37).toLong)
    val one = data.toDF("k").repartition(1)
      .agg(CountMin.cms_sketch(col("k"), depth, width))
      .as[Seq[Long]].collect().head
    val many = data.toDF("k").repartition(8)
      .agg(CountMin.cms_sketch(col("k"), depth, width))
      .as[Seq[Long]].collect().head
    assert(one == many, "counter arrays must be partitioning-invariant")
    assert(one.sum == 5000L * depth, "every row increments depth counters")
  }

  test("adversarial collisions still respect the epsilon bound") {
    // tiny width forces collisions; bound est <= exact + 2N/width must
    // hold for the heavy keys (the CMS Markov-bound contract)
    val w = 16
    val data = ((0 until 900).map(_ => 1L) ++
      (0 until 2000).map(i => (i % 100 + 10).toLong)).toDF("k")
    val n = 2900.0
    val sketch = data.agg(CountMin.cms_sketch(col("k"), depth, w).as("cms"))
    val out = data.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("exact"),
        CountMin.estimate(col("cms"), col("k"), depth, w).as("est"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (k, exact, est) =>
      assert(est >= exact, s"undercount for $k")
      assert(est <= exact + math.ceil(2 * n / w).toLong,
        s"key $k: est $est exceeds exact $exact + ${2 * n / w}")
    }
  }
}
