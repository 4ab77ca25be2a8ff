package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert space-filling curve index — the locality-preserving
  * alternative to the Morton/Z-order code in [[ZOrder]]: consecutive
  * curve positions are always grid-adjacent (no Z-shaped jumps), so
  * range scans over Hilbert-clustered data touch fewer distinct file
  * ranges for the same 2-D selectivity. The trade: the code needs a
  * per-level conditional rotation, where Morton is a pure bit
  * interleave.
  *
  * [[withHilbertCode]] unrolls the classic xy2d recurrence (per level:
  * quadrant digit, then conditional flip-and-swap of the coordinate
  * frame) into `bits` chained projections of plain integer/CASE column
  * algebra — fully codegen-friendly, no UDF — which is also exactly
  * how the relational oracle restates it as CTE stages. Inputs must
  * lie in [0, 2^bits); compose with [[graft.operators.Layout
  * .bucketByBounds]] quantile bucketing for arbitrary columns.
  */
object Hilbert {

  /** Append `outCol` = Hilbert curve position of (xCol, yCol) on the
    * 2^bits x 2^bits grid. One chained projection per level. */
  def withHilbertCode(df: DataFrame, xCol: String, yCol: String,
      bits: Int, outCol: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    var cur = df
      .withColumn("__graft_hx", col(xCol).cast("long"))
      .withColumn("__graft_hy", col(yCol).cast("long"))
      .withColumn(outCol, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__graft_hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val ry = when(col("__graft_hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      cur = cur
        .withColumn("__graft_rx", rx).withColumn("__graft_ry", ry)
        .withColumn(outCol, col(outCol) +
          lit(s * s) * (lit(3L) * col("__graft_rx")).bitwiseXOR(col("__graft_ry")))
        // rotate the frame: on ry = 0, flip both coords when rx = 1,
        // then swap x and y
        .withColumn("__graft_nx", when(col("__graft_ry") === 0,
          when(col("__graft_rx") === 1, lit(s - 1) - col("__graft_hy"))
            .otherwise(col("__graft_hy"))).otherwise(col("__graft_hx")))
        .withColumn("__graft_ny", when(col("__graft_ry") === 0,
          when(col("__graft_rx") === 1, lit(s - 1) - col("__graft_hx"))
            .otherwise(col("__graft_hx"))).otherwise(col("__graft_hy")))
        .withColumn("__graft_hx", col("__graft_nx")).withColumn("__graft_hy", col("__graft_ny"))
    }
    cur.drop("__graft_hx", "__graft_hy", "__graft_rx", "__graft_ry", "__graft_nx", "__graft_ny")
  }

  /** Reference implementation for tests: the same xy2d recurrence as
    * plain Scala. */
  private[graft] def ref(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}
