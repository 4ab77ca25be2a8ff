package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ModularitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two triangles + bridge: decomposition matches the closed form") {
    // nodes 1-3 and 4-6 are triangles, edge (3,4) bridges them
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val got = Modularity.perCommunity(edges, labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // m = 7; community 1: e_c = 3, D_c = 2+2+3 = 7 -> 4*7*3 - 49 = 35
    assert(got(1L) == ((1L, 3L, 7L, 3L, 7L, 35L)))
    assert(got(4L) == ((4L, 3L, 7L, 3L, 7L, 35L)))
    // Q = (35 + 35) / (4 * 49) = 5/14, the textbook value for this graph
    val q = got.values.map(_._6).sum.toDouble / (4.0 * 7 * 7)
    assert(math.abs(q - 5.0 / 14.0) < 1e-15)
  }

  test("single community containing every edge scores Q = 0") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    val row = Modularity.perCommunity(edges, labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // e_c = m and D_c = 2m  =>  score_num = 4m² − 4m² = 0
    assert(row._6 == 0L)
  }

  test("labeled isolated (degree-0) nodes count in n_members") {
    // node 7 has a label but no edges: it must appear in community 1's
    // member count with zero degree/intra contribution, and a whole
    // community of isolates (label 9) must still emit a row.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 1L), (9L, 9L))
      .toDF("node", "label")
    val got = Modularity.perCommunity(edges, labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 6L, 3L, 3L, 0L)))
    assert(got(9L) == ((9L, 1L, 0L, 0L, 3L, 0L)))
  }

  test("community with zero intra edges gets the pure penalty term") {
    // bipartite: every edge crosses the two communities
    val edges = Seq((1L, 2L), (1L, 4L), (3L, 2L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L))
      .toDF("node", "label")
    val got = Modularity.perCommunity(edges, labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 0L && got(1L)._6 == -9L) // D=3, -(3²)
    assert(got(2L)._4 == 0L && got(2L)._6 == -9L)
  }
}
