package graft.core

/** Attribute similarity functions — the reference's scalar extension point
  * (/root/reference/src/main/scala/com/github/cleanzr/dblink/SimilarityFn.scala:25-106).
  *
  * A similarity maps a string pair to [0, maxSimilarity]; `exp(sim)` weights
  * the distortion distribution, so sim == 0 means "no affinity" and constant
  * similarity degrades the model to categorical-only.
  */
sealed trait SimilarityFn extends Serializable {
  def maxSimilarity: Double

  /** True iff sim(a, b) == 0 for all pairs (lets the index skip neighbor
    * construction entirely). */
  def isConstant: Boolean

  def sim(a: String, b: String): Double

  final def expSim(a: String, b: String): Double = math.exp(sim(a, b))
}

/** sim ≡ 0: values either agree exactly or carry no affinity. */
case object ConstantSimilarity extends SimilarityFn {
  val maxSimilarity = 0.0
  val isConstant = true
  def sim(a: String, b: String): Double = 0.0
}

/** Threshold-truncated, rescaled, normalized Levenshtein similarity.
  *
  * unit(a,b) = 1 - 2 d(a,b) / (|a| + |b| + d(a,b))   (Yujian–Bo normalized
  * edit distance, in [0,1]); raw = maxSimilarity * unit; result rescales
  * (raw - threshold)+ back onto [0, maxSimilarity]. Matches the reference
  * goldens (SimilarityFnTest, e.g. sim("AB","BB") = 2.0 at max=10, θ=5).
  */
final case class LevenshteinSimilarity(
    threshold: Double, maxSimilarity: Double) extends SimilarityFn {
  require(maxSimilarity > 0.0, "maxSimilarity must be positive")
  require(threshold >= 0.0 && threshold < maxSimilarity,
    "threshold must be in [0, maxSimilarity)")

  val isConstant = false

  /** Delegates to the codegen kernel so driver-side sims are
    * BIT-identical to the distributed expression (code-point lengths,
    * same rounding order) — a UTF-16 reimplementation here once
    * diverged on astral-plane input. */
  def sim(a: String, b: String): Double =
    graft.functions.LevenshteinSim.sim(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b),
      threshold, maxSimilarity)

  /** Largest |len(a) - len(b)| for which sim can still exceed zero, given
    * one side has length `len` — the lossless blocking bound used by the
    * distributed neighbor join (d >= |Δlen|, so any wider pair is provably
    * sub-threshold). */
  def maxLengthGap(len: Int): Int = {
    val u0 = threshold / maxSimilarity
    if (u0 <= 0.0) Int.MaxValue
    else math.ceil(len * (1.0 - u0) / u0).toInt
  }
}

object Levenshtein {

  /** Classic two-row dynamic-programming edit distance. */
  def distance(a: CharSequence, b: CharSequence): Int = {
    if (a.length == 0) return b.length
    if (b.length == 0) return a.length
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(identity)
    var curr = new Array[Int](s.length + 1)
    var j = 1
    while (j <= t.length) {
      curr(0) = j
      val tc = t.charAt(j - 1)
      var i = 1
      while (i <= s.length) {
        val sub = prev(i - 1) + (if (s.charAt(i - 1) == tc) 0 else 1)
        curr(i) = math.min(math.min(prev(i) + 1, curr(i - 1) + 1), sub)
        i += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      j += 1
    }
    prev(s.length)
  }
}

/** Threshold-truncated, rescaled Jaro–Winkler similarity — the classic
  * name-matching comparator for record linkage, added beyond the
  * reference's constant/Levenshtein pair. Kernel semantics (match
  * window, strict-0.7 boost, 4-char prefix cap) live in
  * graft.functions.JaroWinkler and are pinned to the DuckDB/rapidfuzz
  * convention; this wrapper maps jw∈[0,1] onto [0, maxSimilarity] with
  * the same (raw - θ)+ rescale as LevenshteinSimilarity.
  */
final case class JaroWinklerSimilarity(
    threshold: Double, maxSimilarity: Double) extends SimilarityFn {
  require(maxSimilarity > 0.0, "maxSimilarity must be positive")
  require(threshold >= 0.0 && threshold < maxSimilarity,
    "threshold must be in [0, maxSimilarity)")

  val isConstant = false
  private val rescale = maxSimilarity / (maxSimilarity - threshold)

  def sim(a: String, b: String): Double = {
    val jw = graft.functions.JaroWinkler.sim(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b),
      winkler = true)
    math.max(0.0, rescale * (maxSimilarity * jw - threshold))
  }
}

object SimilarityFn {

  /** Named registry (config surface parity with the reference). */
  def fromName(name: String, threshold: Double = 7.0,
      maxSimilarity: Double = 10.0): SimilarityFn = name match {
    case "constant" | "ConstantSimilarityFn" => ConstantSimilarity
    case "levenshtein" | "LevenshteinSimilarityFn" =>
      LevenshteinSimilarity(threshold, maxSimilarity)
    case "jaro_winkler" | "JaroWinklerSimilarityFn" =>
      JaroWinklerSimilarity(threshold, maxSimilarity)
    case other => throw new IllegalArgumentException(s"unknown similarity: $other")
  }
}
