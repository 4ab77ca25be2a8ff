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

  /** Zone id: the Morton code's high bits — dropping `zoneShift` low
    * bits merges 2^zoneShift adjacent Morton cells into one zone, so a
    * zone is a compact rectangle-ish region of the (x, y) bucket grid.
    * This is the relational stand-in for "which file/row-group would
    * this row land in" after a Z-ordered write. */
  def zoneId(xBucket: Column, yBucket: Column, zoneShift: Int): Column =
    shiftright(ZOrder.z_order2(xBucket, yBucket), zoneShift)

  /** Zone-map index: per-zone row count plus min/max of each stat
    * column — the relational form of parquet row-group statistics and
    * lakehouse file-skipping metadata. The index is O(zones) rows
    * (metadata-sized: thousands of entries for a 100 TB table), so it
    * broadcasts for pruning joins and collects for plan-time partition
    * pruning; count/min/max all merge, so it maintains incrementally
    * under appends without touching old zones. */
  def zoneMapIndex(df: DataFrame, zoneCol: String,
      statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(col(zoneCol))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Merge zone-map indexes (same zone column + stat columns):
    * counts add, mins/maxes combine — so appending a batch means
    * indexing ONLY the batch and merging, never rescanning indexed
    * data. The merge is an aggregation over index rows (metadata-sized
    * input), effectively free next to any data scan. */
  def mergeZoneMaps(indexes: Seq[DataFrame], zoneCol: String,
      statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap(c =>
      Seq(min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c")))
    indexes.reduce(_.unionByName(_))
      .groupBy(col(zoneCol))
      .agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** Zones whose [min, max] interval intersects EVERY requested
    * `(column, lo, hi)` range — the candidate set a skipping scan must
    * read. Zones where any range misses entirely are provably empty of
    * matches and are dropped wholesale. */
  def matchingZones(index: DataFrame, zoneCol: String,
      ranges: Seq[(String, Double, Double)]): DataFrame =
    ranges.foldLeft(index) { case (ix, (c, lo, hi)) =>
      ix.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }.select(col(zoneCol))

  /** Data-skipping scan: consult the zone-map index, broadcast the
    * surviving zone ids into a semi join, then apply the exact
    * predicate. Semantics-preserving by construction — a zone's min/max
    * bound every row in it, so the result ALWAYS equals the plain
    * filter; the index only removes whole zones early. On a table
    * written `partitionBy(zone)` the same candidate set prunes
    * partitions at the scan instead (collect [[matchingZones]] — it is
    * metadata-sized — into an `isin` partition filter; LayoutSpec
    * demonstrates both paths). */
  def pruneByZoneMap(df: DataFrame, index: DataFrame, zoneCol: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    val keep = matchingZones(index, zoneCol, ranges)
    // null-safe semi join: a NULL zone (un-bucketable row) is a real
    // group in the index — `<=>` lets it survive pruning when its
    // stats intersect the ranges, where a plain equi-join would
    // silently drop every such row regardless of its values
    val semi = df.join(broadcast(keep),
      df(zoneCol) <=> keep(zoneCol), "left_semi")
    ranges.foldLeft(semi) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi) }
  }

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
