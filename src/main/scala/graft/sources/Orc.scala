package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the OTHER columnar format real lakes contain at
  * scale (Hive-era warehouses are predominantly ORC; a 100 TB corpus
  * migration cannot assume parquet-only inputs). The reference reads
  * only CSV and Parquet (`IO.scala`); Spark's native ORC reader has
  * full pushdown parity with parquet — predicate pushdown, column
  * pruning, stripe-level min/max skipping — so the engine's scan
  * discipline (filters and projections REACHING the scan, asserted by
  * `OrcSpec`) carries over unchanged.
  *
  * Deliberately thin like [[Jsonl]]; the value is the encoded at-scale
  * discipline:
  *
  *  - **Schema from the footer, never inference.** ORC is
  *    self-describing — reads take the schema from file metadata in
  *    O(files), not from a data pass. (`mergeSchema` stays off: a lake
  *    with per-file schema drift should surface it, not union it.)
  *  - **Write splittable units.** One file per task, sized by upstream
  *    repartition; ORC stripes are the read-side split unit, so a
  *    handful of well-sized files parallelizes reads fine — but never
  *    coalesce to 1.
  */
object Orc {

  /** Write as ORC. `partitions` > 0 repartitions first — size output
    * files for downstream parallelism. */
  def write(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").orc(path)
  }

  /** Read ORC; schema comes from the file footers (self-describing —
    * no inference pass, unlike JSONL). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
