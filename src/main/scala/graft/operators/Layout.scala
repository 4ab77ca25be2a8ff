package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Multi-dimensional data layout: cluster a table in Z-order so that
  * per-file/row-group min/max statistics stay tight on SEVERAL columns
  * at once. A plain sort is one-dimensional — filters on the second
  * column scan everything; Z-order trades a little locality on each
  * dimension for locality on all of them, which is what makes
  * two-dimensional range filters prune a 100 TB parquet table.
  *
  * Scale shape: per-column bucket boundaries come from
  * `approxQuantile` (one sampled aggregation per column — NOT a global
  * ntile window, which would single-partition-sort the table); values
  * bucket by counting boundaries below them against the broadcast
  * boundary array; codes interleave with the native `z_order2`
  * expression; the rewrite is the same single range shuffle any sorted
  * write pays.
  */
object Layout {

  /** Bucket index of `c` against sorted `bounds` (count of boundaries
    * at or below the value) — 0..bounds.length, monotone in `c`.
    * Binary search per row (native codegen'd expression), not a linear
    * array-filter scan; NULL values yield a NULL bucket/code rather
    * than silently joining the smallest values in bucket 0. */
  def bucketByBounds(c: Column, bounds: Array[Double]): Column =
    ZOrder.bucket_by_bounds(c.cast("double"), bounds)

  /** Column-algebra reference form — parity oracle for
    * `BucketBySortedBounds` in LayoutSpec (NOTE: unlike the native form
    * it sends NULL to bucket 0, so parity holds on non-null data). */
  private[operators] def bucketByBoundsAlgebra(
      c: Column, bounds: Array[Double]): Column =
    size(filter(lit(bounds), b => b <= c.cast("double"))).cast("long")

  /** Equi-depth boundaries for `bits`-bit bucketing of a numeric
    * column (2^bits - 1 interior quantiles, relativeError 1e-3). */
  def quantileBounds(df: DataFrame, colName: String, bits: Int): Array[Double] = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.stat.approxQuantile(colName, probs, 1e-3)
  }

  /** Morton code over two numeric columns, bucketed by the given
    * boundary arrays (from [[quantileBounds]], or hand-chosen). */
  def zOrderCode(a: Column, aBounds: Array[Double],
      b: Column, bBounds: Array[Double]): Column =
    ZOrder.z_order2(bucketByBounds(a, aBounds), bucketByBounds(b, bBounds))

  /** Rewrite `df` clustered in Z-order over (colA, colB): equi-depth
    * bucket both columns, range-repartition on the Morton code, sort
    * within partitions. Written out, every file covers a compact Morton
    * range → tight min/max on both columns. The `__z` column is
    * retained so tests (and curious users) can inspect the layout; drop
    * it at write time if unwanted. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      numPartitions: Int, bits: Int = 10): DataFrame = {
    val ba = quantileBounds(df, colA, bits)
    val bb = quantileBounds(df, colB, bits)
    df.withColumn("__z", zOrderCode(col(colA), ba, col(colB), bb))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
  }
}
