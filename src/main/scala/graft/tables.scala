package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, unchanged, against a multi-TB warehouse directory on a real cluster.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark rejects:
    // read nanos as long, then truncate to microsecond timestamps (the
    // same truncation DuckDB applies, keeping oracle parity). The flag
    // has no per-read option, so it must be a session conf; set it only
    // for the one table that needs it (consulted at scan time too, so it
    // cannot be unset after planning) — loading any other table leaves
    // session state untouched.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integral `div`, not `/`: nano ticks exceed double's 53-bit mantissa
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Fan a small-but-CPU-heavy input out to every core before an
    * expensive per-row projection. Small compressed scans are often a
    * single parquet row group (one split), which would serialize the
    * downstream compute onto one task; the round-robin shuffle costs far
    * less than the work it parallelizes.
    *
    * Gated on the input's CURRENT partition count: a corpus that already
    * arrives in >= defaultParallelism splits (the normal case at
    * warehouse scale — thousands of files) is returned untouched, so
    * this never forces a full-corpus round-robin shuffle in front of
    * every sketch stage. Only narrow inputs (local fixtures, single
    * row-group files, post-coalesce frames) pay the spread. */
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames cannot be probed via .rdd (and micro-batch
    // planning re-sizes partitions anyway) — pass them through so the
    // column-algebra operators compose into streaming pipelines
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
