package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain inner join on skewed keys") {
    // one hot key (90% of left rows), duplicate right rows per key, and
    // keys present on only one side — the full inner-join edge surface
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++
      (1 to 50).map(i => ((i % 7 + 2).toLong, s"m$i")) :+
      (99L, "only-left")).toDF("k", "lv")
    val right = (Seq((1L, "hot-a"), (1L, "hot-b")) ++
      (2 to 8).map(i => (i.toLong, s"r$i")) :+
      (98L, "only-right")).toDF("k", "rv")

    val plain = left.join(right, "k").select("k", "lv", "rv")
      .as[(Long, String, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", buckets = 4)
      .select("k", "lv", "rv")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    // the hot key's 900 left rows joined both right rows
    assert(plain.count(_._1 == 1L) == 1800)
  }

  test("connected components: chain, triangle, and isolated pair") {
    // path 30-31-32-33-34 exercises multi-hop propagation (diameter 4)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L))
      .toDF("a", "b")
    val comp = ConnectedComponents.components(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L))
  }

  test("salted join spreads a hot key over multiple buckets") {
    val left = (1 to 400).map(i => (1L, i)).toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("k", "rv")
    // count distinct salts the left side actually produced for the hot key
    val salts = left.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(4)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts == 4, s"expected all 4 salt buckets used, got $salts")
    assert(Skew.saltedJoin(left, right, "k", buckets = 4).count() == 400)
  }
}
