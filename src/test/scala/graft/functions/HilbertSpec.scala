package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column algebra matches the reference over the full 16x16 grid") {
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Hilbert.withHilbertCode(cells.toDF("x", "y"), "x", "y",
        bits = 4, "h")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    for ((x, y) <- cells)
      assert(got((x, y)) == Hilbert.ref(x, y, 4), s"cell ($x,$y)")
  }

  test("the curve is a bijection visiting adjacent cells in order") {
    val bits = 4
    val n = 1 << bits
    val byD = (for (x <- 0L until n; y <- 0L until n)
      yield Hilbert.ref(x, y, bits) -> (x, y)).toMap
    // bijective onto [0, n^2)
    assert(byD.keySet == (0L until (n.toLong * n)).toSet)
    // locality: consecutive curve positions are grid neighbors — the
    // property Morton/Z-order does NOT have (its quadrant jumps)
    for (d <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("first quadrant steps of the order-1 curve") {
    // the classic order-1 shape: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    assert(Hilbert.ref(0, 0, 1) == 0 && Hilbert.ref(0, 1, 1) == 1 &&
      Hilbert.ref(1, 1, 1) == 2 && Hilbert.ref(1, 0, 1) == 3)
  }
}
