package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval analytics: operations over [start, end) spans (sessions,
  * leases, GPU reservations, rate-limit windows). Complements
  * operators/RangeJoin (point-in-interval) and EventAnalytics
  * (sessionize): here whole intervals are first-class inputs.
  */
object IntervalOps {

  /** Peak number of concurrently-open intervals per group, by the
    * classic sweep line: each interval contributes (+1 at start, −1 at
    * end), sorted by (time, delta) — ends sort before starts at the
    * same instant, so half-open [s, e) semantics hold — and the running
    * sum's maximum is the peak concurrency.
    *
    * ONE shuffle (the per-group sort the window needs); the running sum
    * never materializes more than the 2·n event points. Peers with
    * identical (time, delta) keys are order-independent for the MAX:
    * within a tied run of equal deltas the prefix-sum multiset is the
    * same whatever the physical order.
    *
    * `startCol`/`endCol` must be mutually comparable (both micros, or
    * both timestamps of the same flavor).
    */
  def maxConcurrency(intervals: DataFrame, groupCol: String,
      startCol: String, endCol: String): DataFrame = {
    val starts = intervals.select(col(groupCol).as("g"),
      col(startCol).as("t"), lit(1).as("delta"))
    val ends = intervals.select(col(groupCol).as("g"),
      col(endCol).as("t"), lit(-1).as("delta"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionAll(ends)
      .withColumn("__open", sum(col("delta")).over(w))
      .groupBy(col("g"))
      .agg(max(col("__open")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .withColumnRenamed("g", groupCol)
  }

  /** Total covered time per group (union length of possibly-overlapping
    * [start, end) intervals, in the start/end column's unit): the same
    * sweep, accumulating gaps only while at least one interval is open.
    * Start/end must be numeric (e.g. epoch micros).
    */
  def coveredTime(intervals: DataFrame, groupCol: String,
      startCol: String, endCol: String): DataFrame = {
    val starts = intervals.select(col(groupCol).as("g"),
      col(startCol).cast("long").as("t"), lit(1).as("delta"))
    val ends = intervals.select(col(groupCol).as("g"),
      col(endCol).cast("long").as("t"), lit(-1).as("delta"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("g")).orderBy(col("t"), col("delta"))
    starts.unionAll(ends)
      .withColumn("__open", sum(col("delta")).over(w))
      // segment [prev_t, t) was covered iff an interval was open across
      // it, i.e. the running count BEFORE this point (= __open - delta)
      // was positive
      .withColumn("__prev_t", lag(col("t"), 1).over(wLag))
      .withColumn("__covered",
        when(col("__prev_t").isNotNull && (col("__open") - col("delta")) > 0,
          col("t") - col("__prev_t")).otherwise(lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("__covered")).as("covered"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .withColumnRenamed("g", groupCol)
  }
}
