package graft.core

import java.util.SplittableRandom

import org.scalatest.funsuite.AnyFunSuite

class RngSpec extends AnyFunSuite {

  test("alias table rejects invalid weights") {
    assertThrows[IllegalArgumentException](AliasTable(Array.empty[Double]))
    assertThrows[IllegalArgumentException](AliasTable(Array(0.5, -0.1)))
    assertThrows[IllegalArgumentException](AliasTable(Array(0.5, Double.NaN)))
    assertThrows[IllegalArgumentException](AliasTable(Array(0.5, Double.PositiveInfinity)))
    assertThrows[IllegalArgumentException](AliasTable(Array(0.0, 0.0)))
  }

  test("alias table empirical distribution matches weights") {
    val weights = Array(0.1, 0.2, 0.7)
    val table = AliasTable(weights)
    val rng = new SplittableRandom(42L)
    val n = 1000000
    val counts = new Array[Long](weights.length)
    (0 until n).foreach(_ => counts(table.sample(rng)) += 1)
    weights.indices.foreach { i =>
      assert(math.abs(counts(i).toDouble / n - weights(i)) < 0.005,
        s"bucket $i: ${counts(i).toDouble / n} vs ${weights(i)}")
    }
  }

  test("alias table handles extreme probabilities") {
    val weights = Array(1e-9, 1e-9, 0.999999998)
    val table = AliasTable(weights)
    val rng = new SplittableRandom(7L)
    val n = 100000
    val counts = new Array[Long](3)
    (0 until n).foreach(_ => counts(table.sample(rng)) += 1)
    assert(counts(2).toDouble / n > 0.999)
  }

  test("discrete dist: normalization, support, out-of-support zero") {
    val d = new DiscreteDist(Vector("A", "B", "C"), Array(100.0, 200.0, 700.0))
    assert(math.abs(d.probabilityOf("A") - 0.1) < 1e-12)
    assert(math.abs(d.probabilityOf("C") - 0.7) < 1e-12)
    assert(d.probabilityOf("D") == 0.0)
    val rng = new SplittableRandom(3L)
    (0 until 1000).foreach { _ =>
      val v = d.sample(rng)
      assert(d.probabilityOf(v) > 0.0)
    }
  }

  test("seedFor is deterministic and decorrelates coordinates") {
    assert(Rng.seedFor(1L, 2L, 3L) == Rng.seedFor(1L, 2L, 3L))
    assert(Rng.seedFor(1L, 2L, 3L) != Rng.seedFor(1L, 3L, 2L))
    assert(Rng.seedFor(1L, 2L, 3L) != Rng.seedFor(2L, 2L, 3L))
  }

  test("beta sampler has correct mean and variance") {
    val rng = new SplittableRandom(11L)
    val (a, b) = (3.0, 7.0)
    val n = 200000
    var sum = 0.0
    var sumSq = 0.0
    (0 until n).foreach { _ =>
      val x = Rng.nextBeta(rng, a, b)
      assert(x >= 0.0 && x <= 1.0)
      sum += x
      sumSq += x * x
    }
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    assert(math.abs(mean - a / (a + b)) < 0.003, s"mean $mean")
    val expectedVar = a * b / ((a + b) * (a + b) * (a + b + 1.0))
    assert(math.abs(variance - expectedVar) < 0.002, s"var $variance")
  }

  test("beta sampler handles shape < 1") {
    val rng = new SplittableRandom(13L)
    val n = 100000
    var sum = 0.0
    (0 until n).foreach(_ => sum += Rng.nextBeta(rng, 0.5, 50.0))
    assert(math.abs(sum / n - 0.5 / 50.5) < 0.002)
  }

  test("beta sampler never yields NaN at tiny shapes (gamma underflow)") {
    // pow(u, 1/0.001) underflows to 0.0 for ~half the draws: both gammas
    // hitting 0 must resolve to the {0,1} limit, never 0/0 = NaN
    val rng = new SplittableRandom(99L)
    var ones = 0
    val n = 20000
    (0 until n).foreach { _ =>
      val v = Rng.nextBeta(rng, 0.001, 0.001)
      assert(!v.isNaN && v >= 0.0 && v <= 1.0)
      if (v > 0.5) ones += 1
    }
    // Beta(eps, eps) is symmetric on {0, 1}
    assert(math.abs(ones.toDouble / n - 0.5) < 0.02, s"ones $ones")
  }

  test("DiscreteDist duplicate values: probabilityOf matches sampling") {
    val d = new DiscreteDist(IndexedSeq("a", "b", "a"),
      Array(1.0, 1.0, 2.0))
    assert(math.abs(d.probabilityOf("a") - 0.75) < 1e-12)
    assert(math.abs(d.probabilityOf("b") - 0.25) < 1e-12)
    assert(d.probabilityOf("z") == 0.0)
    val rng = new SplittableRandom(7L)
    val n = 100000
    var hits = 0
    (0 until n).foreach(_ => if (d.sample(rng) == "a") hits += 1)
    assert(math.abs(hits.toDouble / n - 0.75) < 0.01)
  }
}
