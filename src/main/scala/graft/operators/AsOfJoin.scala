package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — absent from both the reference and core Spark
  * (SURVEY §2.3 "no as-of joins anywhere"), but table stakes for
  * event-stream feature pipelines: for every left row, the most recent
  * right row with `right.time <= left.time` in the same key group.
  *
  * Spark-first composition (no custom physical operator needed): tag and
  * union both sides, then one `last(value, ignoreNulls)` running window
  * per key ordered by (time, side) — right rows sort before left rows at
  * equal timestamps, so "at or before" semantics fall out of the sort.
  * Cost: ONE shuffle on the key + a per-key sort, identical to the
  * sort-merge join Spark would need anyway; no range explosion, no
  * per-key driver loops. Skew in hot keys is AQE's problem, as with any
  * keyed window.
  *
  * Right rows must be unique per (key, time) for deterministic output —
  * pre-aggregate the right side (the oracle, DuckDB's native ASOF JOIN,
  * leaves equal-timestamp winners unspecified otherwise).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightValCol: String): DataFrame = {
    val reserved = Seq("__side", "__rv", "__asof")
    val clash = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"asOfJoin reserves column name(s) ${clash.mkString(", ")}; rename the input columns")
    val leftCols = left.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    // the right value travels inside a single-field struct: the struct is
    // non-null exactly when the row IS a right row, so last(ignoreNulls)
    // tracks row presence, and a right row whose value column is NULL
    // still wins over older rows (DuckDB ASOF JOIN semantics)
    val rvType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", right.schema(rightValCol).dataType)))
    val lNorm = left.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col): _*)
    val rNorm = right.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("__side"),
        struct(col(rightValCol).as("v")).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionAll(rNorm)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(timeCol)) ++ leftCols.map(col) :+
        col("__asof.v").as(s"asof_$rightValCol"): _*)
  }
}
