package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.globalCount(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect().head

  test("K4 has 4 triangles and clustering 1") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val (e, w, t, c) = stats(k4)
    assert((e, w, t, c) == ((6L, 12L, 4L, 1.0)))
  }

  test("a path has no triangles; a closed ring of 3 has one") {
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))._3 == 0L)
    val (e, w, t, c) = stats(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert((e, w, t, c) == ((3L, 3L, 1L, 1.0)))
  }

  test("duplicate, reversed, and self-loop edges are canonicalized away") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val (e, _, t, _) = stats(noisy)
    assert(e == 3L && t == 1L)
  }

  test("hub graph: star plus one closing edge yields exactly one triangle") {
    // hub 0 connected to 1..10; single peripheral edge (1, 2)
    val edges = (1L to 10L).map(l => (0L, l)) :+ (1L, 2L)
    val (e, w, t, _) = stats(edges)
    assert(e == 11L)
    assert(t == 1L)
    // wedges: C(10,2)=45 at hub + C(2,2)=1 at nodes 1 and 2 each
    assert(w == 47L)
  }
}
