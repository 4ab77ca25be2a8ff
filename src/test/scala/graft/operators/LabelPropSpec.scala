package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force synchronous LPA with min-tie-break. */
  private def brute(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges ++ edges.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    (0 until rounds).foreach { _ =>
      labels = adj.map { case (n, nbrs) =>
        val freq = nbrs.map(labels).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("two triangles joined by a bridge keep distinct communities") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    for (rounds <- Seq(1, 2, 3)) {
      val got = LabelProp.run(edges.toDF("a", "b"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(edges, rounds), s"rounds=$rounds")
    }
    val after3 = LabelProp.run(edges.toDF("a", "b"), 3)
      .as[(Long, Long)].collect().toMap
    assert(Set(after3(1L), after3(2L)).size == 1, "triangle 1 coheres")
    assert(after3(11L) != after3(1L) || after3(12L) != after3(2L),
      s"communities should not fully merge across the bridge: $after3")
  }

  test("random multigraphs match brute force (multi-edge weighting kept)") {
    val rnd = new java.util.Random(23)
    val edges = (0 until 150).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)
    }.filter(e => e._1 != e._2)
    for (rounds <- Seq(1, 2)) {
      val got = LabelProp.run(edges.toDF("a", "b"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(edges, rounds), s"rounds=$rounds")
    }
  }
}
