package graft.core

import java.util.SplittableRandom

/** O(1) categorical sampling via the alias method (Vose's variant).
  *
  * Same capability as the reference's alias sampler
  * (/root/reference/src/main/scala/com/github/cleanzr/dblink/random/AliasSampler.scala:25-118),
  * written fresh from the published algorithm (Vose 1991). Construction is
  * O(n); each draw costs one uniform int + one uniform double.
  */
final class AliasTable private (
    val size: Int,
    private val cutoff: Array[Double],
    private val alias: Array[Int]) extends Serializable {

  def sample(rng: SplittableRandom): Int = {
    val column = rng.nextInt(size)
    if (rng.nextDouble() < cutoff(column)) column else alias(column)
  }
}

object AliasTable {

  /** Build from non-negative, finite, not-all-zero weights. */
  def apply(weights: Array[Double]): AliasTable = {
    require(weights.nonEmpty, "empty weight vector")
    var total = 0.0
    var i = 0
    while (i < weights.length) {
      val w = weights(i)
      require(w >= 0.0 && !w.isNaN && !w.isInfinity, s"invalid weight $w at $i")
      total += w
      i += 1
    }
    require(total > 0.0, "weights sum to zero")

    val n = weights.length
    val scaled = new Array[Double](n)
    i = 0
    while (i < n) { scaled(i) = weights(i) * n / total; i += 1 }

    val cutoff = new Array[Double](n)
    val alias = new Array[Int](n)
    val small = new java.util.ArrayDeque[Int]()
    val large = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      if (scaled(i) < 1.0) small.push(i) else large.push(i)
      i += 1
    }
    while (!small.isEmpty && !large.isEmpty) {
      val s = small.pop()
      val l = large.pop()
      cutoff(s) = scaled(s)
      alias(s) = l
      scaled(l) = (scaled(l) + scaled(s)) - 1.0
      if (scaled(l) < 1.0) small.push(l) else large.push(l)
    }
    while (!large.isEmpty) cutoff(large.pop()) = 1.0
    while (!small.isEmpty) cutoff(small.pop()) = 1.0 // numerical leftovers
    new AliasTable(n, cutoff, alias)
  }
}

/** Discrete distribution over arbitrary values with O(1) draws and O(1)
  * probability lookup (reference capability: DiscreteDist.scala:31-70). */
final class DiscreteDist[T](
    val values: IndexedSeq[T],
    weights: Array[Double]) extends Serializable {

  require(values.length == weights.length, "values/weights length mismatch")
  private val table = AliasTable(weights)
  val totalWeight: Double = weights.sum
  // duplicate values: SUM their weights, so probabilityOf agrees with
  // the sampling distribution (a last-index map would report only one
  // slot's share)
  private val massOf: Map[T, Double] = {
    val m = scala.collection.mutable.HashMap.empty[T, Double]
    var i = 0
    while (i < values.length) {
      m.update(values(i), m.getOrElse(values(i), 0.0) + weights(i))
      i += 1
    }
    m.toMap
  }

  def sample(rng: SplittableRandom): T = values(table.sample(rng))

  /** Normalized probability of `v`; 0 outside the support. Duplicated
    * values report their TOTAL weight share — identical to the
    * frequency `sample` actually produces. */
  def probabilityOf(v: T): Double =
    massOf.getOrElse(v, 0.0) / totalWeight

  def support: Iterator[T] = values.iterator
}

object Rng {

  /** Mix (base seed, stream coordinates) into an independent seed —
    * SplitMix64 finalizer, so (iteration, partition) streams are
    * decorrelated and retry/repartition-safe (a pure function of the
    * logical coordinates, unlike Spark's physical partition index). */
  def seedFor(base: Long, a: Long, b: Long): Long = {
    var z = base + 0x9e3779b97f4a7c15L * (a + 1) + 0xbf58476d1ce4e5b9L * (b + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Draw from Beta(a, b) via two gamma draws (Marsaglia–Tsang for the
    * gamma; shape < 1 boosted through the shape+1 trick). Driver-side use
    * only (conjugate distortion-probability updates). */
  def nextBeta(rng: SplittableRandom, a: Double, b: Double): Double = {
    val x = nextGamma(rng, a)
    val y = nextGamma(rng, b)
    // Tiny shapes can underflow BOTH gamma draws to 0.0 (pow(u, 1/shape)
    // in the shape<1 boost), and 0/0 = NaN would silently poison every
    // later sweep. In that regime Beta(a, b) concentrates on {0, 1} with
    // P(1) = a/(a+b) — the correct limit, drawn explicitly.
    if (x + y == 0.0) {
      if (rng.nextDouble() * (a + b) < a) 1.0 else 0.0
    } else x / (x + y)
  }

  def nextGamma(rng: SplittableRandom, shape: Double): Double = {
    require(shape > 0, s"gamma shape must be positive: $shape")
    if (shape < 1.0) {
      val u = rng.nextDouble()
      nextGamma(rng, shape + 1.0) * math.pow(u, 1.0 / shape)
    } else {
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      while (true) {
        var x = 0.0
        var v = 0.0
        do {
          x = nextGaussian(rng)
          v = 1.0 + c * x
        } while (v <= 0.0)
        v = v * v * v
        val u = rng.nextDouble()
        if (u < 1.0 - 0.0331 * x * x * x * x) return d * v
        if (math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) return d * v
      }
      0.0 // unreachable
    }
  }

  def nextGaussian(rng: SplittableRandom): Double = {
    // Marsaglia polar method
    var s = 0.0
    var u = 0.0
    var v = 0.0
    do {
      u = 2.0 * rng.nextDouble() - 1.0
      v = 2.0 * rng.nextDouble() - 1.0
      s = u * u + v * v
    } while (s >= 1.0 || s == 0.0)
    u * math.sqrt(-2.0 * math.log(s) / s)
  }
}
