package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Interval-containment (range) join at scale — absent from the reference
  * (SURVEY §2.3 "no range/interval joins") and planned by vanilla Spark
  * as a BroadcastNestedLoopJoin, which dies when neither side broadcasts.
  *
  * Banding turns it into a shuffle equi-join: each right interval
  * explodes into the fixed-width time bands it covers, each left row
  * carries its single band, and the bands equi-join before an exact
  * containment filter. A (left, right) match meets in exactly one band
  * (the left row's), so no distinct is needed. Band width trades the
  * right-side explode factor against candidate precision — pick it near
  * the median interval length so the explode factor stays ~2-3×.
  */
object RangeJoin {

  /** Epoch-micros view of an event-time column in any lake flavor:
    * TIMESTAMP passes to `unix_micros` directly; TIMESTAMP_NTZ first
    * casts to TimestampType (lossless under the session-UTC convention,
    * and monotone under any zone — which is all banding needs); a LONG
    * column is taken as micros already. */
  private def microsOf(dt: DataType, c: Column): Column = dt match {
    case LongType => c
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _ => unix_micros(c)
  }

  /** Rows of `left` joined to every `right` interval containing their
    * timestamp: leftTime ∈ [start, end). Timestamps compare at
    * microsecond precision; both sides must use the SAME timestamp
    * flavor (the exact containment filter compares them directly). */
  def bandedIntervalJoin(left: DataFrame, leftTimeCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val lb = left.withColumn("__band",
      floor(microsOf(left.schema(leftTimeCol).dataType, col(leftTimeCol))
        / bandMicros))
    val rb = right.withColumn("__band", explode(sequence(
      floor(microsOf(right.schema(startCol).dataType, col(startCol))
        / bandMicros),
      floor(microsOf(right.schema(endCol).dataType, col(endCol))
        / bandMicros))))
    lb.join(rb, "__band")
      .filter(col(leftTimeCol) >= col(startCol) &&
        col(leftTimeCol) < col(endCol))
      .drop("__band")
  }

  /** Interval-OVERLAP join: every (left, right) pair whose [start, end)
    * spans intersect — the two-sided generalization of the containment
    * join above (concurrent sessions, colliding reservations, lease
    * conflicts). Vanilla Spark plans the two inequality predicates as a
    * BroadcastNestedLoopJoin; banding restores a shuffle equi-join.
    *
    * Both sides explode into their covered bands. An overlapping pair
    * shares every band its INTERSECTION covers — so the join would
    * duplicate it; instead of a `distinct`, the pair is kept only in
    * the FIRST band of the intersection (band == floor(max(s₁,s₂)/w)),
    * which each matching pair passes exactly once. Join fan-out is
    * (len/width + 1) per side — pick the width near the median interval
    * length, exactly as for the containment join. */
  def bandedOverlapJoin(left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    require(Seq(lStartCol, lEndCol, rStartCol, rEndCol).distinct.size == 4,
      "interval column names must be pairwise distinct (the overlap " +
        "filter references both sides by name after the band join)")
    def micros(df: DataFrame, c: String): Column =
      microsOf(df.schema(c).dataType, col(c))
    val lb = left.withColumn("__band", explode(sequence(
      floor(micros(left, lStartCol) / bandMicros),
      floor(micros(left, lEndCol) / bandMicros))))
    val rb = right.withColumn("__band", explode(sequence(
      floor(micros(right, rStartCol) / bandMicros),
      floor(micros(right, rEndCol) / bandMicros))))
    lb.join(rb, "__band")
      // half-open overlap test + dedupe to the intersection's first band
      .filter(col(lStartCol) < col(rEndCol) &&
        col(rStartCol) < col(lEndCol) &&
        col("__band") === floor(
          greatest(micros(left, lStartCol), micros(right, rStartCol))
            / bandMicros))
      .drop("__band")
  }
}
