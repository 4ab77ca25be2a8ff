package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * `z_order2(x, y)` interleaves the low 32 bits of two longs —
  * x on even bit positions, y on odd — so that sorting by the code
  * clusters rows that are close in BOTH dimensions. Laying parquet out
  * in Z-order (see `operators/Layout.zOrdered`) makes per-file/row-group
  * min/max statistics tight on both columns at once, so a scan filtered
  * on either (or both) dimensions prunes most of a 100 TB table instead
  * of only pruning on the single lead sort column.
  *
  * The kernel is the classic five-mask bit spread; the relational
  * equivalent `sum_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1))` is
  * what the DuckDB gate oracle replays.
  */
object ZOrder {

  /** Spread the low 32 bits of v into the even bit positions. */
  def spreadBits(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spreadBits]]: collect the even bit positions. */
  def collectBits(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  def interleave(x: Long, y: Long): Long =
    spreadBits(x) | (spreadBits(y) << 1)

  /** (x, y) recovered from a Morton code. */
  def deinterleave(z: Long): (Long, Long) =
    (collectBits(z), collectBits(z >>> 1))

  def z_order2(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      ZOrder2(
        org.apache.spark.sql.GraftExpressionBridge.expression(x),
        org.apache.spark.sql.GraftExpressionBridge.expression(y)))

  /** Count of sorted `bounds` at or below `v` — binary upper-bound
    * search, O(log n) per row vs the O(n) array-filter form (1023
    * comparisons per row per dimension at bits=10). Ordering via
    * Double.compare, matching Spark SQL's NaN-is-largest semantics. */
  def bucketOf(bounds: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(bounds(mid), v) <= 0) lo = mid + 1
      else hi = mid
    }
    lo.toLong
  }

  def bucket_by_bounds(c: Column, bounds: Array[Double]): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BucketBySortedBounds(
        org.apache.spark.sql.GraftExpressionBridge.expression(c), bounds))

  /** z_order2(bigint, bigint) SQL builder. */
  def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(x, y) => ZOrder2(x, y)
    case _ => throw new IllegalArgumentException(
      "z_order2 expects two bigint arguments")
  }
}

/** Morton interleave of the low 32 bits of two longs (x even bits,
  * y odd bits). Strict bigint inputs — a silently-casted int would
  * truncate differently than the caller expects. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Equi-depth bucket index of a double against a sorted boundary array
  * (count of boundaries at or below the value, 0..bounds.length) via
  * binary search. NULL input yields NULL (propagated by the null-safe
  * wrapper) — callers that want a sentinel bucket must coalesce
  * explicitly; silently mixing NULLs into bucket 0 hid them among the
  * smallest values. */
case class BucketBySortedBounds(child: Expression, bounds: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_by_bounds"

  override protected def nullSafeEval(input: Any): Any =
    ZOrder.bucketOf(bounds, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ZOrder.bucketOf($ref, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
