package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset curation.
  *
  * Train/val/test assignment must be reproducible across runs, engines
  * and languages, and stable under joins — `rand()`-based sampling is
  * none of those. Hash bucketing is: md5 of the id's string form, first
  * 8 hex chars parsed as an integer, modulo the bucket count. The same
  * expression is exactly computable in DuckDB
  * (`CAST('0x' || substr(md5(id), 1, 8) AS BIGINT)`), Python, or
  * anything with md5 — so a split assigned here can be reproduced by a
  * downstream consumer without shipping membership lists.
  */
object Sampling {

  /** Hash bucket in [0, buckets). */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** train / val / test label by percent boundaries over 100 buckets. */
  def split(id: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100")
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Keep a deterministic ~pct% sample. */
  def sampleHash(id: Column, pct: Int): Column = hashBucket(id, 100) < pct

  /** Sequence packing for pretraining: assign documents to fixed
    * token-budget bins. Docs are hash-sharded (so packing parallelizes —
    * no global sort at 100 TB), then packed contiguously within each
    * shard in id order: bin = floor(exclusive-prefix-sum(tokens) /
    * budget). A bin may overrun the budget by at most one document (the
    * standard streaming-packing contract); every doc lands in exactly
    * one (shard, bin). Deterministic and engine-portable — the oracle
    * replays the same windows. */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
      budget: Long, numShards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", hashBucket(col(idCol), numShards))
      .withColumn("bin",
        (coalesce(sum(col(tokenCountCol)).over(w), lit(0L)) / budget)
          .cast("long"))
  }

  /** Deterministic stratified sample: exactly min(k, stratum size) rows
    * per stratum, chosen by md5-hash order of the id (ties broken by the
    * id itself, so the selection is total and engine-portable — the
    * oracle replays it with the same ROW_NUMBER window). One shuffle on
    * the stratum key; rank-k selection happens within each window
    * partition, so a giant stratum never concentrates on one reducer
    * more than its own window sort. For eval-set carving (k per label)
    * rather than percentage splits. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
