package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the expectations gate a training
  * pipeline runs before a batch is allowed to merge: each rule yields
  * one (rule, n_violations) row.
  *
  * Execution shape by rule class:
  *  - every row-local [[Quality.Check]] (null / range / format /
  *    arbitrary predicate) folds into ONE full-scan aggregation of
  *    conditional counts — auditing 20 column rules costs the same
  *    single pass as auditing one;
  *  - [[Quality.Unique]] is one groupBy on the key (violations = rows
  *    in excess of one per key), map-side-combined;
  *  - [[Quality.InDim]] (referential integrity) is one anti join
  *    against the dimension — broadcast when the dimension is small,
  *    which is what makes FK auditing affordable at fact-table scale.
  *
  * The result is a union of O(|rules|) one-row frames — metadata-sized
  * however large the audited table.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Row-local expectation: `violated` marks a failing row. */
  final case class Check(name: String, violated: Column) extends Rule

  /** Key-uniqueness expectation over `keys`. */
  final case class Unique(name: String, keys: Seq[String]) extends Rule

  /** Referential integrity: `key` must exist as `dimKey` in `dim`. */
  final case class InDim(name: String, key: String, dim: DataFrame,
      dimKey: String) extends Rule

  /** (rule, n_violations), one row per rule (unordered — gates sort). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val checks = rules.collect { case c: Check => c }
    val frames: Seq[DataFrame] = {
      val rowFrame = if (checks.isEmpty) Nil else {
        // one conditional-count aggregation for ALL row-local rules,
        // melted to long form with stack()
        val aggs = checks.zipWithIndex.map { case (c, i) =>
          count(when(c.violated, lit(1))).as(s"__c$i") }
        val stackArgs = checks.zipWithIndex.map { case (c, i) =>
          s"'${c.name.replace("'", "''")}', __c$i" }.mkString(", ")
        Seq(df.agg(aggs.head, aggs.tail: _*)
          .selectExpr(
            s"stack(${checks.size}, $stackArgs) AS (rule, n_violations)"))
      }
      val rest = rules.collect {
        case u: Unique =>
          df.groupBy(u.keys.map(col): _*).agg(count(lit(1)).as("__n"))
            .where(col("__n") > 1)
            .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
            .select(lit(u.name).as("rule"), col("n_violations"))
        case r: InDim =>
          df.select(col(r.key))
            .join(broadcast(r.dim.select(col(r.dimKey).as(r.key))),
              Seq(r.key), "left_anti")
            .agg(count(lit(1)).as("n_violations"))
            .select(lit(r.name).as("rule"), col("n_violations"))
      }
      rowFrame ++ rest
    }
    frames.reduce(_.unionByName(_))
  }
}
