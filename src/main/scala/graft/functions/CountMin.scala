package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a native
  * `TypedImperativeAggregate` — the engine's mergeable fixed-size
  * frequency summary, completing the sketch family next to HLL
  * (distinct), KLL (quantiles), SpaceSaving (top-k) and bloom
  * (membership). depth×width counters; a key's estimate is the MIN of
  * its depth counters, so estimates never undercount and overcount by
  * at most ~2N/width with probability 1 − 2^−depth.
  *
  * Scale shape: the buffer is a constant depth·width longs however many
  * rows flow in; partials merge by elementwise add (map-side combine for
  * free, same as the bounded-heap top-k), and the finished sketch is a
  * broadcastable array — point estimates are then pure column algebra
  * (`CountMin.estimate`), no second pass over the data.
  *
  * Bucket hashing lives OUTSIDE the aggregate in column space
  * (`CountMin.buckets` = xxhash64(key, row) mod width), so build and
  * lookup provably share one hash definition, and the aggregate itself
  * stays a dumb counter array.
  */
final class CmsState(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)
}

case class CmsSketch(buckets: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsState] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(buckets)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    buckets.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<BIGINT> buckets, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): CmsState = new CmsState(depth, width)

  override def update(state: CmsState, input: InternalRow): CmsState = {
    val arr = buckets.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      require(a.numElements() == depth,
        s"bucket array has ${a.numElements()} entries, sketch depth is $depth")
      var r = 0
      while (r < depth) {
        val b = a.getLong(r)
        require(b >= 0 && b < width, s"bucket $b outside [0, $width)")
        state.counters(r * width + b.toInt) += 1
        r += 1
      }
    }
    state
  }

  override def merge(state: CmsState, other: CmsState): CmsState = {
    var i = 0
    while (i < state.counters.length) {
      state.counters(i) += other.counters(i); i += 1
    }
    state
  }

  override def eval(state: CmsState): Any =
    new GenericArrayData(state.counters.map(x => x: Any))

  override def serialize(state: CmsState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + state.counters.length * 8)
    buf.putInt(state.depth).putInt(state.width)
    state.counters.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val buf = ByteBuffer.wrap(bytes)
    val state = new CmsState(buf.getInt(), buf.getInt())
    var i = 0
    while (i < state.counters.length) {
      state.counters(i) = buf.getLong(); i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(buckets = newChildren(0))
}

object CountMin {

  /** Per-row bucket array for `key`: row r hashes xxhash64(key, r) mod
    * width. The SAME expression feeds the sketch build and the
    * estimate, so the two cannot drift. */
  def buckets(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      pmod(xxhash64(key, lit(r)), lit(width.toLong))): _*)

  /** Aggregate column building the depth×width counter array. */
  def cms_sketch(key: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CmsSketch(
        org.apache.spark.sql.GraftExpressionBridge.expression(
          buckets(key, depth, width)),
        depth, width).toAggregateExpression())

  /** Point estimate from a finished sketch column: min over the depth
    * rows of the key's counters (1-based element_at). */
  def estimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    (0 until depth).map { r =>
      element_at(sketch,
        (lit(r.toLong * width) + pmod(xxhash64(key, lit(r)), lit(width.toLong))
          + 1L).cast("int"))
    }.reduce(least(_, _))
}
