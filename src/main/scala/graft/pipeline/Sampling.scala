package graft.pipeline

import org.apache.spark.sql.Column
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
}
