package graft.operators

import org.apache.spark.sql.{DataFrame}
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
  * row dominates on max, so it must lose on min).
  *
  * Scale shape: the corpus is range-repartitioned on the maximize
  * dimension (descending), so the sort and both window minima run as
  * parallel per-partition passes. The only cross-partition state is
  * each partition's min(minCol) — one row per partition — whose
  * prefix-minimum over strictly-higher-ranged partitions is broadcast
  * back as a carry-in, exactly the `er/Blocking.globalRank`
  * broadcast-offset pattern. Range partitioning never splits one
  * maximize value across partitions, so the per-group minimum stays
  * local and every preceding partition is strictly better on max. At
  * 1000 executors the serial state is the ≤`partitions`-row offset
  * table, never the corpus.
  *
  * Both dimensions must be integers (the repo's grid discipline), so
  * domination is exact and the result replays on any engine. Ties on
  * BOTH dimensions are mutually non-dominating: every such row is kept.
  */
object Skyline {

  /** Skyline of `df` maximizing `maxCol` and minimizing `minCol`
    * (both integer-valued). Returns the input columns, frontier rows
    * only. `partitions` <= 0 uses the session shuffle parallelism. */
  def pareto2D(df: DataFrame, maxCol: String, minCol: String,
      partitions: Int = 0): DataFrame = {
    // fail loudly on fractional dimensions: the running-min window uses
    // rangeBetween(unboundedPreceding, -1), i.e. "value+1 and above",
    // which is only 'strictly better' on an INTEGER grid — a DOUBLE
    // maxCol would silently emit dominated rows instead of erroring
    Seq(maxCol, minCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"pareto2D needs integer-valued dimensions (the repo's grid " +
          s"discipline); column '$c' is ${df.schema(c).dataType.catalogString}")
    }
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = df.columns
    // Materialized ONCE (via the session's truncation policy): the
    // carry aggregate AND the window scan both read this frame, and
    // __pid is only meaningful if both see the SAME sampled range
    // boundaries. Exchange reuse usually guarantees that, but it is an
    // optimization, not a contract (exchangeReuseEnabled=false or an
    // AQE replan could materialize the two range shuffles with
    // different sampled boundaries). A checkpoint — unlike persist(),
    // whose CacheManager entry lives until explicit unpersist — is
    // reclaimed with the RDD once the result is consumed.
    val cp = LoopCheckpoint.forLoop(df.sparkSession)
    val ranged = cp.pin(df.repartitionByRange(n, col(maxCol).desc)
      .withColumn("__pid", spark_partition_id()))
    // Parallel per-partition windows: running min over strictly-higher
    // max groups, and the per-max-group min (groups never straddle a
    // range partition).
    val higherLocal = Window.partitionBy(col("__pid"))
      .orderBy(col(maxCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val groupLocal = Window.partitionBy(col("__pid"), col(maxCol))
    // Carry-in per partition: min(minCol) over all strictly-preceding
    // (= strictly-higher-max) partitions. One row per partition, so the
    // prefix window and the join are broadcast-scale at any corpus size.
    val carries = ranged.groupBy("__pid").agg(min(col(minCol)).as("__pm"))
      .withColumn("__carry", min(col("__pm")).over(
        Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("__pid", "__carry")
    // finish(): local mode is a no-op; reliable mode roots the (small)
    // frontier at its own durable cut and reclaims the corpus-sized
    // `ranged` pin file rather than leaving it under the checkpoint dir.
    cp.finish(ranged
      .withColumn("__mhl", min(col(minCol)).over(higherLocal))
      .withColumn("__mg", min(col(minCol)).over(groupLocal))
      .join(broadcast(carries), "__pid")
      // least() skips NULLs: NULL carry (first partition) or NULL local
      // running min (top group in a partition) fall through to the other.
      .withColumn("__mh", least(col("__mhl"), col("__carry")))
      .filter(col(minCol) === col("__mg") &&
        (col("__mh").isNull || col(minCol) < col("__mh")))
      .select(cols.map(col): _*))
  }
}
