package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped aggregates — the materialized-view
  * pattern: keep per-group PARTIALS (count / sum / min / max per
  * measure), fold each arriving batch into them with a merge that is
  * associative and commutative, and derive the final aggregates (avg =
  * sum / n) only at read time.
  *
  * At warehouse scale this is the difference between re-scanning the
  * full fact table per refresh and scanning ONLY the new partition: the
  * state table is O(|groups|) rows regardless of fact-table size, the
  * merge shuffles O(|groups| + |delta groups|) rows, and because merge
  * is associative the refresh cadence is free to vary (hourly deltas,
  * daily compactions, backfills in any order).
  *
  * Deletions/updates are out of scope by design: min/max are not
  * subtractable, so general retraction needs a different state shape
  * (e.g. per-group value histograms). Append-only facts — the lake
  * norm — are exactly what this covers.
  */
object IncrementalAgg {

  private def mergeCols(measures: Seq[String]): Seq[Column] =
    sum(col("n")).as("n") +: measures.flatMap { m =>
      Seq(sum(col(s"sum_$m")).as(s"sum_$m"),
        sum(col(s"n_$m")).as(s"n_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m"))
    }

  /** Legacy-state migration: state tables persisted before the n_<m>
    * columns existed default each missing one to the row count — the
    * exact value the old avg divided by, so upgraded reads reproduce
    * the old answers for old state (correct when its measures had no
    * NULLs; unrecoverable information otherwise) instead of failing
    * with an unresolved column. */
  private def withMeasureCounts(state: DataFrame,
      measures: Seq[String]): DataFrame =
    measures.foldLeft(state) { (df, m) =>
      if (df.columns.contains(s"n_$m")) df
      else df.withColumn(s"n_$m", col("n"))
    }

  /** Per-group partial-aggregate state for one batch: `n` (row count)
    * plus sum_/n_/min_/max_ per measure column — `n_m` is the NON-NULL
    * count of measure m, the denominator SQL AVG uses (dividing by the
    * row count would silently diverge from AVG whenever a measure
    * carries NULLs, and the state could never recover the right value
    * after the fact). Map-side combine makes this one shuffle of
    * O(|groups|) rows however large the batch. */
  def partials(batch: DataFrame, keys: Seq[String], measures: Seq[String])
      : DataFrame = {
    val aggs = count(lit(1)).as("n") +: measures.flatMap { m =>
      Seq(sum(col(m)).as(s"sum_$m"),
        count(col(m)).as(s"n_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"))
    }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a new batch's partials into existing state. Associative and
    * commutative: merge(merge(s, d1), d2) == merge(s, d1 union d2). */
  def merge(state: DataFrame, deltaPartials: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val m = mergeCols(measures)
    withMeasureCounts(state, measures)
      .unionByName(withMeasureCounts(deltaPartials, measures),
        allowMissingColumns = false)
      .groupBy(keys.map(col): _*).agg(m.head, m.tail: _*)
  }

  /** Read-time view: the finalized aggregates (count, sum, min, max,
    * avg) derived from the state — no fact-table access. avg divides by
    * the measure's NON-NULL count (SQL AVG semantics); an all-NULL
    * group yields NULL, like AVG. */
  def finalized(state: DataFrame, keys: Seq[String], measures: Seq[String])
      : DataFrame = {
    val derived = col("n") +: measures.flatMap { m =>
      Seq(col(s"sum_$m"), col(s"min_$m"), col(s"max_$m"),
        when(col(s"n_$m") > 0, col(s"sum_$m") / col(s"n_$m"))
          .as(s"avg_$m"))
    }
    withMeasureCounts(state, measures).select(keys.map(col) ++ derived: _*)
  }
}
