package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Rows of `left` joined to every `right` interval containing their
    * timestamp: leftTime ∈ [start, end). Timestamps compare at
    * microsecond precision. */
  def bandedIntervalJoin(left: DataFrame, leftTimeCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val lb = left.withColumn("__band",
      floor(unix_micros(col(leftTimeCol)) / bandMicros))
    val rb = right.withColumn("__band", explode(sequence(
      floor(unix_micros(col(startCol)) / bandMicros),
      floor(unix_micros(col(endCol)) / bandMicros))))
    lb.join(rb, "__band")
      .filter(col(leftTimeCol) >= col(startCol) &&
        col(leftTimeCol) < col(endCol))
      .drop("__band")
  }
}
