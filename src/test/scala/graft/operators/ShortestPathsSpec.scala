package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ShortestPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long], k: Int) =
    ShortestPaths.hopDistances(edges.toDF("src", "dst"),
      seeds.toDF("node"), k).as[(Long, Int)].collect().toMap

  test("chain distances from a single seed, capped at maxHops") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(dists(chain, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(dists(chain, Seq(1L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("multi-seed takes the minimum; direction is respected") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L), (4L, 3L))
    val got = dists(edges, Seq(1L, 4L), 3)
    // node 3: 2 hops from 1 but only 1 from seed 4
    assert(got == Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1, 5L -> -1)
      .filter(_._2 >= 0))
    // 5 only points INTO 4 — unreachable, absent
    assert(!got.contains(5L))
  }

  test("a cycle converges and stops early without revisiting") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(dists(ring, Seq(1L), 50) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("maxHops 0 returns just the seeds") {
    assert(dists(Seq((1L, 2L)), Seq(1L), 0) == Map(1L -> 0))
  }

  private def wdists(edges: Seq[(Long, Long, Double)], seeds: Seq[Long],
      rounds: Int) =
    ShortestPaths.boundedDistances(edges.toDF("src", "dst", "w"),
      seeds.toDF("node"), rounds).as[(Long, Double)].collect().toMap

  test("weighted: a cheaper two-leg path beats the direct edge") {
    // 1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 2 + 3 = 5
    val edges = Seq((1L, 3L, 10.0), (1L, 2L, 2.0), (2L, 3L, 3.0))
    assert(wdists(edges, Seq(1L), 1) == Map(1L -> 0.0, 2L -> 2.0, 3L -> 10.0))
    assert(wdists(edges, Seq(1L), 2) == Map(1L -> 0.0, 2L -> 2.0, 3L -> 5.0))
  }

  test("weighted: multi-seed minimum and a relaxation chain") {
    // chain 1->2->3->4 weight 1 each; seed 4 reaches nothing (directed)
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
    val got = wdists(edges, Seq(1L, 3L), 3)
    assert(got == Map(1L -> 0.0, 3L -> 0.0, 2L -> 1.0, 4L -> 1.0))
  }

  test("weighted: zero rounds returns the seeds at distance zero") {
    assert(wdists(Seq((1L, 2L, 5.0)), Seq(2L), 0) == Map(2L -> 0.0))
  }
}
