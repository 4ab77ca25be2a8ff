package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each rule class counts exactly its planted violations") {
    val df = Seq(
      (1L, Some("a"), 0.05),  // clean
      (2L, None, 0.05),       // null violation
      (3L, Some("b"), 0.25),  // range violation
      (3L, Some("b"), 0.25),  // duplicate key 3 (and another range hit)
      (4L, Some("c"), -0.1),  // range violation (below)
      (9L, Some("d"), 0.0)    // dangling FK
    ).toDF("k", "flag", "disc")
    val dim = Seq(1L, 2L, 3L, 4L).toDF("dk")
    val got = Quality.audit(df, Seq(
        Quality.Check("flag_not_null", col("flag").isNull),
        Quality.Check("disc_range", col("disc") < 0 || col("disc") > 0.1),
        Quality.Unique("k_unique", Seq("k")),
        Quality.InDim("k_in_dim", "k", dim, "dk")))
      .as[(String, Long)].collect().toMap
    assert(got == Map("flag_not_null" -> 1L, "disc_range" -> 3L,
      "k_unique" -> 1L, "k_in_dim" -> 1L))
  }

  test("a clean table yields all-zero counts, one row per rule") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val got = Quality.audit(df, Seq(
        Quality.Check("v_not_null", col("v").isNull),
        Quality.Unique("k_unique", Seq("k"))))
      .as[(String, Long)].collect().toMap
    assert(got == Map("v_not_null" -> 0L, "k_unique" -> 0L))
  }
}
