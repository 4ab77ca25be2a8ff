package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime bloom-filter join injection — Spark's row-level runtime
  * filtering (SPARK-32268): when one join side carries a selective
  * filter, the optimizer plants a bloom-filter aggregate on that side
  * and a `BloomFilterMightContain` predicate on the other, so the big
  * side drops non-joining rows BEFORE the shuffle. At 100 TB this is
  * the difference between shuffling a full fact table and shuffling
  * the ~2% of it that can possibly join — the same effect dynamic
  * partition pruning has for partition columns, extended to arbitrary
  * join keys.
  *
  * The stock thresholds are tuned for clusters (application side must
  * scan ≥ 10 GB before the rule fires), so at gate scale the rule is
  * silently inert. [[withRuntimeBloom]] pins the thresholds so the
  * injection actually exercises — and disables broadcast so the join
  * is the shuffle join the rule targets (at 100 TB it would be one
  * anyway) — then restores every conf. Results must be IDENTICAL with
  * and without the filter (a bloom false positive only wastes a probe;
  * the equi-join re-checks the key), which is exactly what the gate's
  * DuckDB oracle asserts. The plan-shape assertion (the filter is
  * really there) lives in PlanSpec.
  */
object RuntimeFilter {

  private val pinned: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // fire regardless of the application side's scan size
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    // the rule targets shuffle joins; keep the dims from broadcasting
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Evaluate `f` under forced runtime-bloom-filter confs; restore the
    * previous values after. `f` must EXECUTE its plan inside the window
    * (e.g. via an eager localCheckpoint) — injection happens at
    * optimization time, so a lazily returned DataFrame planned after
    * restore would not carry the filter. */
  def withRuntimeBloom[T](spark: SparkSession)(f: => T): T = synchronized {
    val prev = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => try spark.conf.unset(k) catch { case _: Throwable => () }
    }
  }
}
