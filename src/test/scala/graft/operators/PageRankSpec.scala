package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Dense-array reference: the same damped power iteration computed
    * with plain Scala loops (uniform dangling redistribution). */
  private def reference(edges: Seq[(Int, Int)], nNodes: Int, iters: Int,
      d: Double = 0.85): Array[Double] = {
    val out = Array.fill(nNodes)(0)
    edges.foreach { case (s, _) => out(s) += 1 }
    var r = Array.fill(nNodes)(1.0 / nNodes)
    for (_ <- 0 until iters) {
      val contrib = Array.fill(nNodes)(0.0)
      edges.foreach { case (s, t) => contrib(t) += r(s) / out(s) }
      val dangling = (0 until nNodes).filter(out(_) == 0).map(r).sum
      r = Array.tabulate(nNodes)(v =>
        (1 - d) / nNodes + d * (contrib(v) + dangling / nNodes))
    }
    r
  }

  test("matches dense reference on a graph with a dangling node") {
    // 0 -> 1 -> 2 -> 0 cycle; 3 points into the cycle; 4 is dangling
    // (reached from 2 but no out-edges)
    val edges = Seq((0, 1), (1, 2), (2, 0), (3, 1), (2, 4))
    val df = edges.toDF("src", "dst")
    val got = PageRank.run(df, iterations = 5)
      .as[(Int, Double)].collect().toMap
    val want = reference(edges, 5, 5)
    assert(got.keySet == Set(0, 1, 2, 3, 4))
    for ((v, r) <- got) assert(math.abs(r - want(v)) < 1e-12,
      s"node $v: got $r want ${want(v)}")
    // mass conservation: dangling redistribution keeps sum(r) = 1
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("zero iterations returns the uniform start") {
    val df = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val got = PageRank.run(df, iterations = 0).as[(Int, Double)]
      .collect().toMap
    assert(got == Map(1 -> 1.0 / 3, 2 -> 1.0 / 3, 3 -> 1.0 / 3))
  }

  /** Dense-array reference for the personalized variant: teleport (and
    * dangling return) concentrated on the seed set. */
  private def referencePpr(edges: Seq[(Int, Int)], nNodes: Int,
      seeds: Set[Int], iters: Int, d: Double = 0.85): Array[Double] = {
    val out = Array.fill(nNodes)(0)
    edges.foreach { case (s, _) => out(s) += 1 }
    val tele = Array.tabulate(nNodes)(v =>
      if (seeds(v)) 1.0 / seeds.size else 0.0)
    var r = tele.clone()
    for (_ <- 0 until iters) {
      val contrib = Array.fill(nNodes)(0.0)
      edges.foreach { case (s, t) => contrib(t) += r(s) / out(s) }
      val dangling = (0 until nNodes).filter(out(_) == 0).map(r).sum
      r = Array.tabulate(nNodes)(v =>
        (1 - d) * tele(v) + d * (contrib(v) + dangling * tele(v)))
    }
    r
  }

  test("personalized ranks match the seeded reference and favor seeds") {
    // 0 -> 1 -> 2 -> 0 cycle; 3 points in; 4 dangling off node 2
    val edges = Seq((0, 1), (1, 2), (2, 0), (3, 1), (2, 4))
    val got = PageRank.runPersonalized(edges.toDF("src", "dst"),
        Seq(0).toDF("node"), iterations = 5)
      .as[(Int, Double)].collect().toMap
    val want = referencePpr(edges, 5, Set(0), 5)
    for ((v, r) <- got) assert(math.abs(r - want(v)) < 1e-12,
      s"node $v: got $r want ${want(v)}")
    // mass conserved; node 3 gets NO rank (nothing points to it and it
    // is not a seed), the seed neighborhood holds the mass
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(3) == 0.0)
    assert(got(0) > got(4))
  }

  test("personalized with all nodes seeded is NOT classic pagerank bitwise") {
    // same distribution mathematically, but (1-d)*(1/n) vs (1-d)/n
    // differ in the last ulp — the uniform path keeps the classic
    // constant; this pins that the two entry points stay distinct
    val edges = Seq((0, 1), (1, 0)).toDF("src", "dst")
    val classic = PageRank.run(edges, 2).as[(Int, Double)].collect().toMap
    val ppr = PageRank.runPersonalized(edges,
      Seq(0, 1).toDF("node"), 2).as[(Int, Double)].collect().toMap
    for ((v, r) <- ppr) assert(math.abs(r - classic(v)) < 1e-15)
  }

  /** Dense-array reference for the weighted variant. */
  private def referenceW(edges: Seq[(Int, Int, Double)], nNodes: Int,
      iters: Int, d: Double = 0.85): Array[Double] = {
    val outw = Array.fill(nNodes)(0.0)
    edges.foreach { case (s, _, w) => outw(s) += w }
    var r = Array.fill(nNodes)(1.0 / nNodes)
    for (_ <- 0 until iters) {
      val contrib = Array.fill(nNodes)(0.0)
      edges.foreach { case (s, t, w) => contrib(t) += r(s) * w / outw(s) }
      val dangling = (0 until nNodes).filter(outw(_) == 0.0).map(r).sum
      r = Array.tabulate(nNodes)(v =>
        (1 - d) / nNodes + d * (contrib(v) + dangling / nNodes))
    }
    r
  }

  test("weighted ranks match the reference; uniform weights equal classic") {
    val wEdges = Seq((0, 1, 3.0), (1, 2, 1.0), (2, 0, 2.0), (3, 1, 5.0),
      (2, 4, 1.0))
    val got = PageRank.runWeighted(wEdges.toDF("src", "dst", "w"), 5)
      .as[(Int, Double)].collect().toMap
    val want = referenceW(wEdges, 5, 5)
    for ((v, r) <- got) assert(math.abs(r - want(v)) < 1e-12,
      s"node $v: got $r want ${want(v)}")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // unit weights reduce to the classic algorithm
    val edges = Seq((0, 1), (1, 2), (2, 0))
    val classic = PageRank.run(edges.toDF("src", "dst"), 4)
      .as[(Int, Double)].collect().toMap
    val unit = PageRank.runWeighted(
      edges.map(e => (e._1, e._2, 1.0)).toDF("src", "dst", "w"), 4)
      .as[(Int, Double)].collect().toMap
    for ((v, r) <- unit) assert(math.abs(r - classic(v)) < 1e-15)
  }

  test("star graph ranks hub and cycle leaf above plain leaves") {
    val leaves = (1 to 8)
    // leaves -> hub 0, hub cycles mass back to leaf 1: the hub and leaf
    // 1 trade the aggregate mass between rounds, so BOTH must outrank
    // the plain leaves (which only ever hold the teleport floor)
    val edges = leaves.map(l => (l, 0)) :+ (0, 1)
    val got = PageRank.run(edges.toDF("src", "dst"), iterations = 10)
      .as[(Int, Double)].collect().toMap
    assert((2 to 8).forall(l => got(0) > got(l)))
    assert((2 to 8).forall(l => got(1) > got(l)))
    val want = reference(edges, 9, 10)
    for ((v, r) <- got) assert(math.abs(r - want(v)) < 1e-12)
  }
}
