package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.LevenshteinSimilarity

class LevenshteinSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expression matches the core implementation over sample pairs") {
    val core = LevenshteinSimilarity(5.0, 10.0)
    val pairs = Seq(("AB", "BB"), ("CARSTEN", "KARSTEN"), ("", ""),
      ("", "xyz"), ("same", "same"), ("MEIER", "MEYER"), ("a", "zzzzzzzz"))
    val got = pairs.toDF("a", "b")
      .select(LevenshteinSim.lev_sim(col("a"), col("b"), 5.0, 10.0))
      .as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), s) =>
      assert(math.abs(s - core.sim(a, b)) < 1e-12, s"($a, $b)")
    }
  }

  test("null propagation") {
    val r = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(LevenshteinSim.lev_sim(col("a"), col("b")))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL registration with default and explicit parameters") {
    LevenshteinSim.register(spark)
    Seq(("AB", "BB")).toDF("a", "b").createOrReplaceTempView("lv")
    val r = spark.sql(
      "SELECT lev_sim(a, b, 5.0, 10.0) AS s1, lev_sim(a, b) AS s2 FROM lv").head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(r.getDouble(1) >= 0.0) // default θ=7 truncates this pair to 0
  }
}
