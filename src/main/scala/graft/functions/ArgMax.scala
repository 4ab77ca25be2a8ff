package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Buffer for [[ArgMaxStruct]]: the payload row seen at the highest
  * version so far, stored as a copied `UnsafeRow` (bytes, not object
  * graph — serialization for the shuffle is a plain array copy). */
final class ArgMaxState {
  var version: Long = Long.MinValue
  var payload: UnsafeRow = null
}

/** `arg_max_struct(payload_struct, version)`: the payload of the row
  * with the highest BIGINT version in each group.
  *
  * Spark's own `max_by` is a `DeclarativeAggregate` whose buffer holds
  * the candidate struct; struct-typed buffers are immutable to
  * `HashAggregateExec`, so plans degrade to `SortAggregate` — a
  * per-partition sort of the full input on BOTH sides of the shuffle.
  * As a `TypedImperativeAggregate` this runs in `ObjectHashAggregate`:
  * hash-based, with map-side partials, so a CDC merge shuffles one
  * candidate row per (key, partition) and never sorts. Version ties
  * keep the first-seen candidate — callers needing determinism must
  * supply a total per-key version order (the MERGE INTO contract). */
case class ArgMaxStruct(payload: Expression, ord: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxState] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType
  override def prettyName: String = "arg_max_struct"

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, ord.dataType) match {
      case (_: StructType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (p, o) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (STRUCT payload, BIGINT version), got " +
          s"(${p.catalogString}, ${o.catalogString})")
    }

  private lazy val schema = payload.dataType.asInstanceOf[StructType]
  // converts the evaluated payload (a GenericInternalRow from a struct
  // constructor, or a row read from storage) into a self-contained
  // UnsafeRow the buffer can own
  @transient private lazy val toUnsafe = UnsafeProjection.create(schema)

  override def createAggregationBuffer(): ArgMaxState = new ArgMaxState

  override def update(state: ArgMaxState, input: InternalRow): ArgMaxState = {
    val v = ord.eval(input)
    if (v != null) {
      val ver = v.asInstanceOf[Long]
      if (state.payload == null || ver > state.version) {
        val p = payload.eval(input)
        if (p != null) {
          state.version = ver
          state.payload = toUnsafe(p.asInstanceOf[InternalRow]).copy()
        }
      }
    }
    state
  }

  override def merge(state: ArgMaxState, other: ArgMaxState): ArgMaxState = {
    if (other.payload != null &&
        (state.payload == null || other.version > state.version)) {
      state.version = other.version
      state.payload = other.payload
    }
    state
  }

  override def eval(state: ArgMaxState): Any = state.payload

  override def serialize(state: ArgMaxState): Array[Byte] = {
    if (state.payload == null) return Array.emptyByteArray
    val rowBytes = state.payload.getBytes
    val buf = ByteBuffer.allocate(8 + rowBytes.length)
    buf.putLong(state.version).put(rowBytes)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxState = {
    val state = new ArgMaxState
    if (bytes.nonEmpty) {
      val buf = ByteBuffer.wrap(bytes)
      state.version = buf.getLong()
      // own a private copy: `bytes` may be a reused buffer
      val rowBytes = new Array[Byte](bytes.length - 8)
      System.arraycopy(bytes, 8, rowBytes, 0, rowBytes.length)
      val owned = new UnsafeRow(schema.length)
      owned.pointTo(rowBytes, rowBytes.length)
      state.payload = owned
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxStruct =
    copy(payload = newChildren(0), ord = newChildren(1))
}

object ArgMax {
  /** Aggregate column: payload struct of the highest-version row. */
  def arg_max_struct(payload: Column, version: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      ArgMaxStruct(
        org.apache.spark.sql.GraftExpressionBridge.expression(payload),
        org.apache.spark.sql.GraftExpressionBridge.expression(version))
        .toAggregateExpression())
}
