package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native one-pass sketch expressions (SURVEY §4.2 custom `Expression`
  * path). The column-algebra forms of these sketches are correct but
  * allocate per row: a 128-slot MinHash signature via
  * `array(array_min(transform(...)) * 128)` materializes 128 intermediate
  * arrays per document, and a 64-bit SimHash via 64 `aggregate` folds
  * walks the token array 64 times. These expressions compute the same
  * values — bitwise identical — in a single traversal with two scalar
  * loops and no intermediate allocation, and participate in whole-stage
  * codegen.
  */
object Sketches {

  /** Per-slot remix seeds reproducing `xxhash64(lit(i), h)` exactly:
    * Spark's XxHash64 folds children left-to-right from seed 42, so
    * xxhash64(i: Int, h: Long) == hashLong(h, hashInt(i, 42)). */
  private[functions] def minhashSeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  def minhashSigKernel(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = seeds.length
    val out = new Array[Long](n)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    val m = arr.numElements()
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < n) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < out(i)) out(i) = v
          i += 1
        }
      } else {
        // a null slot contributes seeds(i) per hash function — exactly
        // the column-algebra form: xxhash64(lit(i), NULL) SKIPS the null
        // child, not the row, so transform yields hashInt(i, 42) for
        // that slot and array_min folds it in (merely skipping the slot
        // here would break the documented bitwise parity)
        var i = 0
        while (i < n) {
          if (seeds(i) < out(i)) out(i) = seeds(i)
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def simhashSigKernel(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var j = 0
    val m = arr.numElements()
    while (j < m) {
      // null slots skipped (xxhash64-fold equivalence: null inputs
      // leave the running hash untouched)
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Hyperplane component h_{b,i} for the LSH sketch, reproducing the
    * column form `(pmod(xxhash64(seed, b, i), 2e6) - 1e6) / 1e6`
    * exactly (XxHash64 folds its children from seed 42). Matrices are
    * cached JVM-globally per (seed, bits, dim) — values are deterministic
    * so concurrent recomputation is benign. The cache is size-bounded:
    * `dim` comes from each row's array length, so ragged embedding data
    * would otherwise grow one matrix per distinct length without bound;
    * past the cap the cache is cleared and rebuilt (cheap, deterministic
    * recompute — a handful of matrices in any sane workload). */
  private val PlaneCacheMaxEntries = 64
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private[functions] def planes(seed: Int, bits: Int, dim: Int): Array[Array[Double]] = {
    if (planeCache.size() > PlaneCacheMaxEntries) planeCache.clear()
    planeCache.computeIfAbsent((seed, bits, dim), _ => {
      val seedH = XXH64.hashInt(seed, 42L)
      Array.tabulate(bits) { b =>
        val base = XXH64.hashInt(b, seedH)
        Array.tabulate(dim) { i =>
          // the column form's sequence() yields INTs — fold as hashInt
          val h = XXH64.hashInt(i, base)
          val m = h % 2000000L
          val pm = if (m < 0) m + 2000000L else m
          (pm.toDouble - 1000000.0) / 1000000.0
        }
      }
    })
  }

  def hyperplaneSigKernel(arr: ArrayData, seed: Int, bits: Int): Long = {
    val dim = arr.numElements()
    // a null element poisons every projection in the column-algebra
    // form (x * h = NULL -> the aggregate sum is NULL -> every
    // `when(proj > 0)` is false), so the whole signature is 0 — match
    // that exactly rather than reading the null slot's storage as
    // garbage through getFloat
    var i0 = 0
    while (i0 < dim) {
      if (arr.isNullAt(i0)) return 0L
      i0 += 1
    }
    val hs = planes(seed, bits, dim)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val row = hs(b)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        proj += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (proj > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Sliding-window hashes for substring-span dedup: out[w] =
    * xxhash64 over elements [w, w+span) of the input array<long>,
    * reproducing `xxhash64(slice(arr, w+1, span))` exactly (Spark's
    * XxHash64 folds array elements left-to-right from seed 42). Arrays
    * shorter than one span yield a single hash over all elements —
    * mirroring the clamped-sequence column form — and an empty array
    * yields [42] (the fold seed), like xxhash64 of an empty slice. One
    * pass, no per-window slice allocation. */
  def spanHashesKernel(arr: ArrayData, span: Int): ArrayData = {
    val n = arr.numElements()
    val windows = math.max(n - span + 1, 1)
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var h = 42L
      var j = w
      val end = math.min(w + span, n)
      while (j < end) {
        // null slots skipped inside the window (xxhash64 fold semantics)
        if (!arr.isNullAt(j)) h = XXH64.hashLong(arr.getLong(j), h)
        j += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  def span_hashes(tokenHashes: Column, span: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SpanHashes(org.apache.spark.sql.GraftExpressionBridge
        .expression(tokenHashes), span))

  /** span_hashes(array<long>, span-literal). */
  def spanHashesBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, s: org.apache.spark.sql.catalyst.expressions.Literal) =>
      SpanHashes(a, s.value.asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "span_hashes expects (array<long>, span literal)")
  }

  def hyperplane_sig(vec: Column, bits: Int, seed: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      HyperplaneSig(org.apache.spark.sql.GraftExpressionBridge
        .expression(vec), bits, seed))

  def minhash_sig(shingleHashes: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      MinHashSig(org.apache.spark.sql.GraftExpressionBridge
        .expression(shingleHashes), numHashes))

  def simhash_sig(tokenHashes: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SimHashSig(org.apache.spark.sql.GraftExpressionBridge
        .expression(tokenHashes)))

  /** SQL builders (used by GraftExtensions injection):
    * minhash_sig(array<long>, numHashes-literal), simhash_sig(array<long>). */
  def minhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, n: org.apache.spark.sql.catalyst.expressions.Literal) =>
      MinHashSig(a, n.value.asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "minhash_sig expects (array<long>, numHashes literal)")
  }

  /** Analysis-time input check shared by the sketch expressions: the
    * kernels read fixed byte widths off ArrayData, so anything but the
    * exact element type must fail analysis, not return garbage. */
  private[functions] def requireArrayOf(fn: String, child: Expression,
      elem: DataType): TypeCheckResult = child.dataType match {
    case ArrayType(e, _) if e == elem => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<${elem.catalogString}> input, got ${other.catalogString}")
  }

  def simhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a) => SimHashSig(a)
    case _ => throw new IllegalArgumentException(
      "simhash_sig expects one array<long> argument")
  }

  /** hyperplane_sig(array<float>, bits-literal[, seed-literal]). */
  def hyperplaneBuilder(exprs: Seq[Expression]): Expression = {
    def intLit(e: Expression): Int = e match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal =>
        l.value.asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        "hyperplane_sig expects literal bits/seed arguments")
    }
    exprs match {
      case Seq(a, bits) => HyperplaneSig(a, intLit(bits), 0)
      case Seq(a, bits, seed) => HyperplaneSig(a, intLit(bits), intLit(seed))
      case _ => throw new IllegalArgumentException(
        "hyperplane_sig expects (array<float>, bits literal[, seed literal])")
    }
  }
}

/** MinHash signature: for each of `numHashes` remixed hash functions, the
  * minimum over the input array<long>. Bitwise-equal to
  * `array((0 until n).map(i => array_min(transform(col, h =>
  * xxhash64(lit(i), h)))))` for non-empty input (an empty input yields
  * Long.MaxValue slots rather than nulls — shingle arrays are never
  * empty). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")
  @transient private lazy val seeds = Sketches.minhashSeeds(numHashes)

  // strict (no implicit cast): these are exposed through the SQL surface,
  // and a mistyped input (e.g. array<int>) would otherwise read the wrong
  // byte widths off ArrayData and return garbage instead of failing
  // analysis
  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireArrayOf(prettyName, child, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.minhashSigKernel(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sketches.minhashSigKernel($a, $seedsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH sketch over an array<float> embedding: bit b is
  * the sign of the dot product with the b-th pseudo-random hyperplane.
  * Bitwise-equal to the column-algebra form in VectorOps (which
  * regenerated every hyperplane component per row via xxhash64 through
  * three temp arrays per bit); here the component matrix is computed once
  * per (seed, bits, dim) per JVM. */
case class HyperplaneSig(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 64, "bits in 1..64")

  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireArrayOf(prettyName, child, FloatType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.hyperplaneSigKernel(input.asInstanceOf[ArrayData], seed, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sketches.hyperplaneSigKernel($a, $seed, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes: bit b of the
  * result is set iff more tokens have bit b set than cleared. Bitwise
  * equal to the 64-fold `aggregate` column formula (including the empty
  * input, which yields 0). */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireArrayOf(prettyName, child, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhashSigKernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sketches.simhashSigKernel($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sliding-window span hashes over an array<long> of token hashes —
  * the gram generator for exact substring-span dedup
  * (CorpusStats.duplicateSpanPairs). Bitwise-equal to
  * `transform(sequence(1, greatest(n - span + 1, 1)),
  *   i => xxhash64(slice(arr, i, span)))`
  * without the per-window slice allocation. */
case class SpanHashes(child: Expression, span: Int)
    extends UnaryExpression {

  require(span >= 1, "span must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    Sketches.requireArrayOf(prettyName, child, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.spanHashesKernel(input.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sketches.spanHashesKernel($a, $span);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
