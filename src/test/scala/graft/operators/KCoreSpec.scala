package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force peeling on in-memory adjacency. */
  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var changed = true
    while (changed) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
      changed = next != alive
      alive = next
    }
    edges.filter(e => alive(e._1) && alive(e._2))
      .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size }
  }

  test("triangle + pendant: the 2-core is exactly the triangle") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val out = KCore.kCore(edges.toDF("a", "b"), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascading peel: removing a node drops its neighbors below k") {
    // path 1-2-3-4-5 at k=2 peels completely, over multiple rounds
    val edges = (1L to 4L).map(i => (i, i + 1))
    val out = KCore.kCore(edges.toDF("a", "b"), k = 2).collect()
    assert(out.isEmpty, "a path has an empty 2-core")
  }

  for (k <- Seq(2, 3, 4))
  test(s"random graphs match brute-force peeling at k=$k") {
    val rnd = new java.util.Random(k * 1000 + 7)
    val edges = (0 until 400).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val expected = bruteKCore(edges, k)
    val got = KCore.kCore(edges.toDF("a", "b"), k)
      .as[(Long, Long)].collect().toMap.map { case (n, d) => n -> d.toInt }
    assert(got == expected)
  }
}
