package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the metadata half of an OPTIMIZE /
  * rewrite job: given a catalog of files (or any sized units) it
  * assigns each to an output bin so every bin lands near a target byte
  * size, keeping the existing order within each partition key (so
  * range/Z-order clustering laid down earlier survives the rewrite).
  *
  * Binning rule: a file joins bin floor(bytesBefore / targetBytes),
  * where bytesBefore is the running total of preceding files in the
  * same key group. Sequential level binning is deliberately chosen over
  * first-fit-decreasing: it is deterministic, order-preserving,
  * single-window-expressible (the oracle can state it as plain SQL),
  * and its overshoot is bounded by one file — the accepted trade in
  * production table services.
  *
  * Scale: this plans over file METADATA, not file bytes — O(|files|)
  * rows windowed per partition key. At 100 TB with 128 MB files that is
  * ~800k rows, a single-executor-size problem; the expensive part (the
  * rewrite itself) consumes the plan as an ordinary
  * partitionBy-and-write over the binned assignment.
  */
object Compaction {

  /** Assign each file a `bin` within its key group: files ordered by
    * `orderCol`, bin = floor(running-bytes-before / targetBytes).
    * `orderCol` must be unique within each key group (file names/ids
    * are) — ties would make the running total, and with it the bin
    * assignment, depend on shuffle order. */
  def plan(files: DataFrame, keys: Seq[String], orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.withColumn("bin",
      floor(coalesce(sum(col(sizeCol)).over(w), lit(0L)) /
        lit(targetBytes.toDouble)).cast("long"))
  }

  /** Per-bin summary of a plan: file count, total bytes, and the
    * order-key range each output file will cover. */
  def summarize(planned: DataFrame, keys: Seq[String], orderCol: String,
      sizeCol: String): DataFrame =
    planned.groupBy((keys :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_bytes"),
        min(col(orderCol)).as("first_key"),
        max(col(orderCol)).as("last_key"))
}
