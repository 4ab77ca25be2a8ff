package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CardinalityEstimateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("buckets = 1 keeps every key, so the estimate IS the exact count") {
    val left = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val right = Seq(1L, 2L, 2L, 3L).toDF("rk")
    val est = CardinalityEstimate.joinSizeByKeySample(left, "k",
      right, "rk", buckets = 1).as[Long].head()
    // exact: key 1 -> 2*1, key 2 -> 1*2, key 3 -> 3*1 = 7
    assert(est == 7L)
  }

  test("sampled estimate lands near exact on a seeded many-key join") {
    val rng = new scala.util.Random(99)
    val left = Seq.fill(4000)(rng.nextInt(500).toLong).toDF("k")
    val right = Seq.fill(4000)(rng.nextInt(500).toLong).toDF("rk")
    val exact = left.join(right, $"k" === $"rk").count()
    val est = CardinalityEstimate.joinSizeByKeySample(left, "k",
      right, "rk", buckets = 8).as[Long].head()
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"est $est vs exact $exact")
  }

  test("key sampling keeps whole key groups: scaling identity over residues") {
    // partition property: summing UNSCALED sampled sizes over all
    // bucket residues recovers the exact join size exactly
    val left = Seq.fill(200)(scala.util.Random.nextInt(40).toLong).toDF("k")
    val right = Seq.fill(200)(scala.util.Random.nextInt(40).toLong).toDF("rk")
    val exact = left.join(right, $"k" === $"rk").count()
    import org.apache.spark.sql.functions._
    def bucketOf(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 4
    val total = left.withColumn("b", bucketOf(col("k")))
      .join(right.withColumn("rb", bucketOf(col("rk"))),
        col("k") === col("rk") && col("b") === col("rb"))
      .count()
    assert(total == exact)
  }
}
