package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** TopKState's ordering contract: total, arrival-order independent,
  * NaN handled deterministically (Double.compare: NaN above every
  * number; NaN-NaN and ±0.0 tie on id). */
class TopKSpec extends AnyFunSuite {

  private def topOf(k: Int, rows: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val st = new TopKState(k)
    rows.foreach { case (s, id) => st.insert(s, id) }
    (0 until st.n).map(i => (st.scores(i), st.ids(i)))
  }

  test("NaN scores rank deterministically regardless of arrival order") {
    val rows = Seq((Double.NaN, 7L), (9.0, 1L), (5.0, 2L), (Double.NaN, 3L))
    val expect = topOf(3, rows)
    rows.permutations.foreach { perm =>
      val got = topOf(3, perm)
      assert(got.map(_._2) == expect.map(_._2), s"perm $perm")
      assert(got.map(_._2) == Seq(3L, 7L, 1L)) // NaNs first (id asc), then 9.0
    }
  }

  test("plain scores: order (score desc, id asc), ±0.0 ties on id") {
    val rows = Seq((1.0, 5L), (0.0, 9L), (-0.0, 2L), (1.0, 3L), (-1.0, 1L))
    rows.permutations.take(40).foreach { perm =>
      assert(topOf(4, perm).map(_._2) == Seq(3L, 5L, 2L, 9L), s"perm $perm")
    }
  }
}
