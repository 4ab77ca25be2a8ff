package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC merge (MERGE INTO semantics) — absent from the reference (its
  * state store is overwrite-only, `State.scala` round-trips whole
  * checkpoints) and from core Spark's DataFrame API, but the backbone of
  * any continuously-maintained corpus snapshot: apply a change batch of
  * upserts and deletes to a keyed snapshot, keeping the highest-version
  * row per key.
  *
  * Spark-first shape: tag the snapshot version 0, `unionByName` the
  * change batch, then ONE hash aggregate per key — the native
  * `arg_max_struct(payload, version)` aggregate — and drop keys whose
  * winning row is a delete. (Spark's built-in `max_by` would express
  * the same thing but its struct-typed declarative buffer degrades the
  * plan to SortAggregate; the TypedImperativeAggregate stays in
  * ObjectHashAggregate — see functions/ArgMax.scala.) That is a single
  * shuffle on the merge key with map-side partial aggregation, the
  * minimal data movement any merge needs; no window, no sort, no join.
  * At 100 TB the snapshot side dominates: bucket the
  * snapshot and the change feed on the key to make the shuffle a no-op
  * for the snapshot (operators/Bucketing.scala pattern), and AQE handles
  * hot-key skew in the aggregate as with any keyed reduction.
  *
  * Version ties are the caller's contract (CDC feeds carry a total
  * per-key order: LSN, commit timestamp + batch seq, ...); rows at equal
  * version have an unspecified winner, exactly like MERGE INTO with
  * multiple matches.
  */
object Merge {

  /** Latest-row-wins merge. `changes` must carry `snapshot`'s columns
    * plus `versionCol` (numeric, higher = newer) and `opCol`
    * ('U' upsert / 'D' delete). Returns the merged snapshot with the
    * snapshot's original columns. */
  def mergeLatest(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    require((payload :+ opCol).forall(changes.columns.contains),
      s"changes must carry ${payload.mkString(", ")} plus $versionCol/$opCol")
    val snapTagged = snapshot
      .withColumn(versionCol, lit(0L))
      .withColumn(opCol, lit("U"))
    val winner: Column = graft.functions.ArgMax.arg_max_struct(
      struct((payload :+ opCol).map(col): _*), col(versionCol).cast("long"))
    snapTagged.unionByName(
        changes.select(snapTagged.columns.toIndexedSeq.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(winner.as("__w"))
      .filter(col(s"__w.$opCol") === "U")
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Snapshot diff — the inverse of [[mergeLatest]]: recover the change
    * set between two versions of a keyed table. Emits one row per key
    * inserted ('I', only in the new version), deleted ('D', only in the
    * old), or updated ('U', in both with any compared column differing,
    * null-safely); unchanged keys emit nothing. `changed_cols` lists
    * the differing columns comma-joined in the caller's order, so a
    * consumer can route column-level changes without re-comparing.
    *
    * One full-outer hash join on the key — the minimal movement a diff
    * needs. At 100 TB bucket both versions on the key
    * (operators/Bucketing.scala) to make the join shuffle-free; the
    * output is change-sized, not snapshot-sized, so downstream stages
    * (audit sinks, incremental re-index, CDC replay) scale with churn. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new"): _*)
    val differs = compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val bothPresent = col("__in_old").isNotNull && col("__in_new").isNotNull
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(differs, "U"))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols", concat_ws(",", compareCols.map(c =>
        when(bothPresent && !(col(s"old_$c") <=> col(s"new_$c")),
          lit(c))): _*))
      .drop("__in_old", "__in_new")
  }

  /** Slowly-changing-dimension type-2 history: from a keyed change log,
    * one validity interval per observed state — (key, value, valid_from,
    * valid_to, is_current), half-open [from, to), `valid_to` NULL on the
    * current row. One keyed window (lead over the per-key event order) —
    * a single shuffle on the key, the same cost as sorting the log. */
  def scd2History(log: DataFrame, keyCols: Seq[String], timeCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    log.select((keyCols ++ Seq(timeCol, tieCol) ++ valueCols).map(col): _*)
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .select(keyCols.map(col) ++ valueCols.map(col) ++ Seq(
        col(timeCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Point-in-time join — the feature-store correctness pattern: each
    * fact picks the [[scd2History]] dimension version valid at the
    * fact's own timestamp (half-open [valid_from, valid_to)), adding
    * `pit_<value>` (NULL for facts before any version).
    *
    * NOT a non-equi interval join (which Catalyst would plan as a
    * nested-loop): because a well-formed SCD2 history TILES time —
    * valid_to is exactly the next valid_from — "version valid at t" is
    * "latest valid_from at or before t", so the join becomes one union
    * + one keyed window: state and fact rows interleave in (time, kind)
    * order (states first at equal instants, so a fact on a boundary
    * sees the NEW version, matching the half-open interval) and each
    * fact takes the last non-null carried value. One shuffle on the
    * key, any history size.
    *
    * Preconditions, both guaranteed by [[scd2History]] output: history
    * tiles per key with no gaps, and `valueCol` is non-null. Multiple
    * versions at one instant resolve to the `valueCol`-largest (the
    * zero-width earlier intervals match nothing, as in the relational
    * BETWEEN form). */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame, keyCol: String,
      factTimeCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__kind"), col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val vType = history.schema(valueCol).dataType
    val factRows = facts
      .withColumn("__t", col(factTimeCol))
      .withColumn("__kind", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val stateRows = history.select(col(keyCol),
      col("valid_from").as("__t"), lit(0).as("__kind"),
      col(valueCol).as("__v"))
    factRows.unionByName(stateRows, allowMissingColumns = true)
      .withColumn(s"pit_$valueCol",
        last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__kind") === 1)
      .drop("__t", "__kind", "__v")
  }
}
