package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated by any other row,
  * where domination means >= on the maximize dimension AND <= on the
  * minimize dimension with at least one strict — the multi-objective
  * selection primitive (Börzsönyi et al., "The Skyline Operator", ICDE
  * 2001) behind "best quality at every cost level" document curation.
  *
  * For two dimensions the skyline has a sort-scan closed form that
  * needs no pairwise comparison at all: order by the maximize
  * dimension descending — a row survives iff its minimize value (a) is
  * the minimum within its own maximize-value group (an equal-max,
  * strictly-cheaper row dominates it) and (b) is strictly below the
  * running minimum over all strictly-better maximize groups (any such
  * row dominates on max, so it must lose on min). Expressed as two
  * window minima — one RANGE frame ending 1 PRECEDING (strictly-higher
  * groups only), one per-group partition — so Catalyst plans a sort +
  * two window passes, never the O(n²) domination join.
  *
  * Both dimensions must be integers (the repo's grid discipline), so
  * domination is exact and the result replays on any engine. Ties on
  * BOTH dimensions are mutually non-dominating: every such row is kept.
  *
  * Scale note: the unpartitioned window is a single global sort of the
  * (id, max, min) projection — fine to ~10⁸ rows; beyond that, split
  * by range partitions on the maximize dimension with
  * `er/Blocking.globalRank`'s broadcast-offset pattern and carry each
  * partition's running minimum forward (one extra 1-row-per-partition
  * broadcast), exactly as globalRank does for ranks.
  */
object Skyline {

  /** Skyline of `df` maximizing `maxCol` and minimizing `minCol`
    * (both integer-valued). Returns the input columns, frontier rows
    * only. */
  def pareto2D(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val higher = Window.orderBy(col(maxCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val group = Window.partitionBy(col(maxCol))
    df.withColumn("__mh", min(col(minCol)).over(higher))
      .withColumn("__mg", min(col(minCol)).over(group))
      .filter(col(minCol) === col("__mg") &&
        (col("__mh").isNull || col(minCol) < col("__mh")))
      .drop("__mh", "__mg")
  }
}
