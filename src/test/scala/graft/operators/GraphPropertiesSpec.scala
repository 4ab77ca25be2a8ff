package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized (seeded) cross-checks of the graph family against
  * brute-force references — the distributed operators must agree with
  * O(n^3)-style direct computation on arbitrary small graphs, not just
  * the hand-picked fixtures in their unit specs. */
class GraphPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, nEdges: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nEdges)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
  }

  test("triangle census equals brute force on random graphs") {
    for (seed <- Seq(11, 23, 37)) {
      val edges = randomGraph(seed, n = 12, nEdges = 30)
      val canon = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      var brute = 0L
      for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        k <- (j + 1) until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if canon((a, b)) && canon((b, c)) && canon((a, c))
      } brute += 1
      val got = Triangles.globalCount(edges.toDF("src", "dst"))
        .select("n_triangles").as[Long].head()
      assert(got == brute, s"seed $seed: $got vs brute $brute")
    }
  }

  test("pagerank invariants on random graphs: mass 1, teleport floor") {
    for (seed <- Seq(5, 19)) {
      val edges = randomGraph(seed, n = 15, nEdges = 25)
        .filter(e => e._1 != e._2)
      val ranks = PageRank.run(edges.toDF("src", "dst"), iterations = 4)
        .as[(Long, Double)].collect()
      val n = ranks.length
      assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-9, s"seed $seed mass")
      // every node holds at least the undamped teleport share
      assert(ranks.forall(_._2 >= (1 - 0.85) / n - 1e-12), s"seed $seed floor")
    }
  }

  test("hop distances equal repeated-squaring reachability on random graphs") {
    for (seed <- Seq(7, 29)) {
      val edges = randomGraph(seed, n = 10, nEdges = 18)
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, 3L)
      // dense reference: level-by-level BFS
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var level = seeds.toSet
      val dist = scala.collection.mutable.Map(seeds.map(_ -> 0): _*)
      var k = 0
      while (level.nonEmpty && k < 6) {
        k += 1
        level = level.flatMap(v => adj.getOrElse(v, Nil))
          .filterNot(dist.contains)
        level.foreach(v => dist(v) = k)
      }
      val got = ShortestPaths.hopDistances(edges.toDF("src", "dst"),
        seeds.toDF("node"), maxHops = 6).as[(Long, Int)].collect().toMap
      assert(got == dist.toMap, s"seed $seed: $got vs ${dist.toMap}")
    }
  }

  test("bounded Bellman-Ford equals dense DP on random weighted graphs") {
    for (seed <- Seq(13, 41)) {
      val rng = new scala.util.Random(seed)
      val edges = randomGraph(seed, n = 10, nEdges = 20)
        .filter(e => e._1 != e._2).distinct
        .map(e => (e._1, e._2, (rng.nextInt(9) + 1).toDouble))
      val seeds = Seq(1L)
      val rounds = 3
      // dense DP reference over exactly `rounds` relaxation rounds
      var d = Map(1L -> 0.0)
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s, t, w) =>
          d.get(s).map(ds => t -> (ds + w)) }
        d = (d.toSeq ++ relaxed).groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
      }
      val got = ShortestPaths.boundedDistances(
        edges.toDF("src", "dst", "w"), seeds.toDF("node"), rounds)
        .as[(Long, Double)].collect().toMap
      assert(got == d, s"seed $seed: $got vs $d")
    }
  }
}
