package graft.er

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class FellegiSunterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("u-probabilities equal the exact marginal collision probability") {
    // attribute x: values a,a,a,b → u = (9 + 1) / 16
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("id", "x")
    val u = FellegiSunter.uProbabilities(df, Seq("x")).collect().head
    assert(u.getAs[Double]("u_x") == 10.0 / 16.0)
  }

  test("scores are the exact log-likelihood-ratio sums; blocking bounds pairs") {
    val df = Seq(
      (1L, 1, "p", "q"),   // block 1
      (2L, 1, "p", "q"),   // agrees with 1 on both
      (3L, 1, "p", "z"),   // agrees on x only
      (4L, 2, "p", "q")    // different block: never paired with 1-3
    ).toDF("id", "blk", "x", "y")
    val m = Map("x" -> 0.9, "y" -> 0.8)
    val out = FellegiSunter.scoreBlockedPairs(df, "id", Seq("x", "y"), m,
        Seq("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Int]("n_agree"), r.getAs[Double]("score"))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"blocking must exclude cross-block pairs: ${out.keySet}")
    // u over ALL records: x: 4/4 agree-prob 1.0? no — all x = "p" → u_x = 1
    // (log(m/1) = log .9); y: q,q,z,q → u_y = (9+1)/16
    def lg2(v: Double) = math.log(v) / math.log(2)
    val uy = 10.0 / 16.0
    val full = lg2(0.9 / 1.0) + lg2(0.8 / uy)
    val xOnly = lg2(0.9 / 1.0) + lg2(0.2 / (1 - uy))
    assert(out((1L, 2L))._1 == 2)
    assert(math.abs(out((1L, 2L))._2 - full) < 1e-12)
    assert(out((1L, 3L))._1 == 1)
    assert(math.abs(out((1L, 3L))._2 - xOnly) < 1e-12)
    assert(out((2L, 3L))._1 == 1)
  }

  test("attr doubling as a block column is rejected up front") {
    val df = Seq((1L, 1, "p", "q")).toDF("id", "blk", "x", "y")
    val e1 = intercept[IllegalArgumentException] {
      FellegiSunter.scoreBlockedPairs(df, "id", Seq("x", "blk"),
        Map("x" -> 0.9, "blk" -> 0.8), Seq("blk"))
    }
    assert(e1.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      FellegiSunter.agreementPatterns(df, "id", Seq("blk", "y"), Seq("blk"))
    }
    assert(e2.getMessage.contains("disjoint"))
  }

  test("matches rank above non-matches on a planted-duplicate table") {
    val rnd = new java.util.Random(11)
    val base = (0 until 200).map { i =>
      (i.toLong, i % 4, rnd.nextInt(30), rnd.nextInt(30), rnd.nextInt(30))
    }
    // plant 10 true duplicates: same attributes, new id
    val dups = (0 until 10).map { i =>
      val b = base(i); (1000L + i, b._2, b._3, b._4, b._5)
    }
    val df = (base ++ dups).toDF("id", "blk", "x", "y", "z")
    val m = Map("x" -> 0.9, "y" -> 0.9, "z" -> 0.9)
    val top = FellegiSunter.scoreBlockedPairs(df, "id", Seq("x", "y", "z"),
        m, Seq("blk"))
      .orderBy(col("score").desc, col("a"), col("b")).limit(10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    assert((top & planted).size >= 8,
      s"planted duplicates must dominate the top scores: $top")
  }
}
