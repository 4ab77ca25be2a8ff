package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
      val h = arr.getLong(j)
      var i = 0
      while (i < n) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < out(i)) out(i) = v
        i += 1
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
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
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

  def simhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a) => SimHashSig(a)
    case _ => throw new IllegalArgumentException(
      "simhash_sig expects one array<long> argument")
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

/** 64-bit SimHash over an array<long> of token hashes: bit b of the
  * result is set iff more tokens have bit b set than cleared. Bitwise
  * equal to the 64-fold `aggregate` column formula (including the empty
  * input, which yields 0). */
case class SimHashSig(child: Expression) extends UnaryExpression {

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
