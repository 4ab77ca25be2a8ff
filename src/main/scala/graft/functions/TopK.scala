package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the k best (score DESC, id ASC) pairs,
  * kept SORTED best-first. Insertion cost is O(log k) to reject a
  * non-qualifying row (one comparison against the current worst after
  * the buffer fills) and O(k) array shift to admit one, so a scan is
  * O(n) once the buffer saturates — the point of aggregating instead
  * of window-ranking. */
final class TopKState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** (score, id) beats slot i? Order: score desc, id asc. NaN is
    * ordered deterministically ABOVE every number (Double.compare
    * semantics) — raw `>`/`==` would make NaN unbeatable AND unable to
    * beat, leaving the result dependent on row arrival order. Equal
    * finite scores (and ±0.0, which compare equal under `==`) keep the
    * id tiebreak. */
  private def beats(s: Double, id: Long, i: Int): Boolean = {
    val si = scores(i)
    // tie = equal values (covers ±0.0, like the oracle) or both NaN
    val tie = (s == si) || (s != s && si != si)
    if (tie) id < ids(i)
    else java.lang.Double.compare(s, si) > 0
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, n - 1)) return
    // binary search for the insertion slot among [0, n)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(s, id, mid)) hi = mid else lo = mid + 1
    }
    val last = if (n < k) n else k - 1
    var i = last
    while (i > lo) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(lo) = s
    ids(lo) = id
    if (n < k) n += 1
  }
}

/** `top_k_by_score(score, id, k)`: aggregate to the k best (score DESC,
  * id ASC) rows of each group as `array<struct<score:double,id:bigint>>`
  * — a native `TypedImperativeAggregate`, so Spark's HashAggregate
  * machinery gives MAP-SIDE PARTIAL top-k for free: each partition
  * shuffles at most k entries per group instead of every row, which is
  * the difference between a window-rank quota (full shuffle + sort of
  * the corpus) and an aggregation (shuffle bounded by groups×k) at
  * 100 TB. Ties break on ascending id, making the result a total order
  * — engine-portable and exactly replayable by a DuckDB window oracle. */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  // strict typing: a silently-cast score column would reorder ties
  // differently than the oracle's window replay
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (DOUBLE score, BIGINT id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(state: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      state.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    state
  }

  override def merge(state: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.n) {
      state.insert(other.scores(i), other.ids(i))
      i += 1
    }
    state
  }

  override def eval(state: TopKState): Any = {
    val out = new Array[Any](state.n)
    var i = 0
    while (i < state.n) {
      out(i) = new GenericInternalRow(
        Array[Any](state.scores(i), state.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(state: TopKState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + state.n * 16)
    buf.putInt(state.k).putInt(state.n)
    var i = 0
    while (i < state.n) {
      buf.putDouble(state.scores(i)).putLong(state.ids(i)); i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val state = new TopKState(buf.getInt())
    val n = buf.getInt()
    var i = 0
    // entries arrive best-first (serialized sorted), so insert is the
    // cheap append path
    while (i < n) {
      state.insert(buf.getDouble(), buf.getLong()); i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopK {
  /** Aggregate column: k best (score desc, id asc) per group. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      TopKByScore(
        org.apache.spark.sql.GraftExpressionBridge.expression(score),
        org.apache.spark.sql.GraftExpressionBridge.expression(id),
        k).toAggregateExpression())
}
