package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("naive Bayes recovers cleanly separable classes") {
    val docs = Seq(
      (1L, "apple banana apple", "fruit"),
      (2L, "banana apple banana", "fruit"),
      (3L, "carrot potato carrot", "veg"),
      (4L, "potato carrot potato", "veg"),
      // held-in test docs: vocabulary clearly from one class
      (5L, "apple apple banana", "fruit"),
      (6L, "carrot potato potato", "veg")
    ).toDF("id", "text", "label")
    val out = Classify.naiveBayes(docs, "id", "text", "label")
      .select("id", "pred").as[(Long, String)].collect().toMap
    assert(out(5L) == "fruit" && out(6L) == "veg")
    assert(out(1L) == "fruit" && out(3L) == "veg")
  }

  test("scores match the closed-form Laplace model on a tiny corpus") {
    // 2 docs, 2 classes, V = {a, b}: hand-computable
    val docs = Seq((1L, "a a", "x"), (2L, "b", "y")).toDF("id", "text", "label")
    val out = Classify.naiveBayes(docs, "id", "text", "label")
      .select("id", "pred", "score").as[(Long, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // class x: tokens 2 (a:2), class y: tokens 1 (b:1); V=2
    // P(a|x) = 3/4, P(a|y) = 1/3; priors 1/2 each
    val sx = math.log(0.5) + 2 * math.log(3.0 / 4)
    assert(out(1L)._1 == "x")
    assert(math.abs(out(1L)._2 - math.rint(sx * 1e6) / 1e6) < 1e-9)
  }

  test("ties break to the lexicographically smaller class") {
    // perfectly symmetric classes → identical scores everywhere
    val sym = Seq(
      (1L, "a b", "c1"), (2L, "a b", "c2"), (5L, "a b", "c1"),
      (6L, "a b", "c2")
    ).toDF("id", "text", "label")
    val out = Classify.naiveBayes(sym, "id", "text", "label")
      .select("id", "pred").as[(Long, String)].collect().toMap
    assert(out.values.forall(_ == "c1"),
      s"symmetric model must tie-break to c1: $out")
  }
}
