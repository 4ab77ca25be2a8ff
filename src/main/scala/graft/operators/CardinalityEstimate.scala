package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-cardinality estimation by deterministic key-hash sampling —
  * what a planner (or a pipeline guard deciding whether a join is safe
  * to run) needs BEFORE paying for the join: keep only keys whose md5
  * bucket is 0 on BOTH sides, join the survivors, scale by the bucket
  * count.
  *
  * Sampling KEYS (not rows) is what makes the estimate unbiased for
  * equi-joins: a key's full multiplicity on both sides either survives
  * intact or disappears entirely, so the sampled join size is exactly
  * the sum over sampled keys of cntL * cntR — 1/buckets of the total
  * in expectation, with variance driven by per-key multiplicity skew.
  * The hash is the engine's portable md5-bucket convention (same
  * buckets from SQL, Python, or any md5), so estimates are reproducible
  * across engines and runs — no RNG.
  *
  * Cost: a map-side filter on each input and a join carrying
  * ~1/buckets of the rows — the estimate is ~buckets-times cheaper
  * than the join it predicts. */
object CardinalityEstimate {

  private def sampled(c: Column, buckets: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets === 0

  /** One row, `est_rows`: estimated size of `left ⋈ right` on
    * leftKey = rightKey. */
  def joinSizeByKeySample(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    left.where(sampled(col(leftKey), buckets))
      .join(right.where(sampled(col(rightKey), buckets)),
        col(leftKey) === col(rightKey))
      .agg((count(lit(1)) * buckets).as("est_rows"))
  }
}
