package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an append-only event log — funnel
  * conversion, cohort retention, and time-grid gap-filling. The
  * reference has no event-log surface at all (its only temporal data is
  * the MCMC iteration counter, `DiagnosticsWriter.scala:39-72`); these
  * are the standard product-analytics queries any engine fed by an
  * event stream must answer, and each is shaped so the heavy input
  * passes through exactly one keyed reduction before anything joins or
  * windows.
  *
  * Scale notes (100 TB event log, billions of users):
  *  - every operator here keys its first shuffle on the user/entity id,
  *    the highest-cardinality column — no hot keys, AQE handles stragglers;
  *  - per-user state after the first reduction is tiny (a step bitmask,
  *    a first-seen week, a bucket list), so follow-up joins/windows run
  *    on reduced data, not the raw log;
  *  - nothing below ever sorts the full log: funnels fold a per-user
  *    sorted array (bounded by events-per-user), retention and gap-fill
  *    window over per-(user,bucket) aggregates.
  */
object EventAnalytics {

  /** Time-grid resampling to OHLC bars (open/high/low/close + count),
    * the standard downsample for any metric stream: ONE hash
    * aggregation — open and close ride `min_by`/`max_by` keyed on the
    * (ts, tie) struct order, so no window, no sort, no second pass over
    * the log. The tie column makes first/last well-defined under equal
    * timestamps; at warehouse scale the shuffle carries only
    * |keys × buckets| result rows thanks to map-side partials. */
  def resampleOhlc(events: DataFrame, keys: Seq[String], bucket: Column,
      tsCol: String, tieCol: String, valueCol: String): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    events
      .groupBy(keys.map(col) :+ bucket.as("bucket"): _*)
      .agg(min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Statistical anomaly detection: flag events whose value deviates
    * from the per-key mean by more than `k` sample standard deviations.
    * Two passes over the log, both cheap: ONE aggregation builds the
    * per-key (mean, stddev) profile — O(|keys|) rows, broadcastable —
    * and the flagging join streams the log against it map-side.
    * Thresholds are rounded (6 places) BEFORE comparison so the flag is
    * reproducible across engines and runs: raw mean/stddev are
    * float-order-sensitive, and an unrounded threshold would let the
    * last ulp decide a boundary row. */
  def anomalies(events: DataFrame, keys: Seq[String], valueCol: String,
      k: Double): DataFrame = {
    val profile = events.groupBy(keys.map(col): _*)
      .agg(round(avg(col(valueCol)), 6).as("mean"),
        round(stddev_samp(col(valueCol)), 6).as("std"))
    events.join(broadcast(profile), keys)
      .withColumn("is_anomaly",
        abs(col(valueCol) - col("mean")) > lit(k) * col("std"))
  }

  /** Time-series similarity search, exact form: resample each key's
    * series onto a shared time grid (per-bucket mean), then pair
    * distances as a bucket-aligned self-join — squared Euclidean over
    * the buckets both keys populated, with a minimum-overlap guard so
    * sparse series cannot win on a handful of shared points.
    *
    * The self-join is keyed on the GRID BUCKET, so each bucket group
    * expands |keys in bucket|^2 pairs: exact and fine up to a few
    * thousand series. Beyond that, this is deliberately the same
    * vectorize-then-search shape as the ANN family — resample into
    * fixed-dimension vectors and hand them to the LSH/IVF path
    * (pipeline/VectorOps), which replaces the quadratic expansion with
    * bucketed candidate generation. */
  def seriesNearestPairs(events: DataFrame, keyCol: String, bucket: Column,
      valueCol: String, minSharedBuckets: Int): DataFrame = {
    val series = events
      .groupBy(col(keyCol).as("k"), bucket.as("bk"))
      .agg(avg(col(valueCol)).as("v"))
    series.as("x").join(series.as("y"),
        col("x.bk") === col("y.bk") && col("x.k") < col("y.k"))
      .groupBy(col("x.k").as("a"), col("y.k").as("b"))
      // (x-y)*(x-y), not pow(_, 2): Math.pow is only 1-ulp-accurate,
      // the product is exactly rounded — and bit-equal to any engine's
      // multiplication
      .agg(sum((col("x.v") - col("y.v")) * (col("x.v") - col("y.v")))
        .as("dist2"), count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minSharedBuckets)
  }

  /** Hot-key guardrail for the collect-sort-fold operators ([[funnel]],
    * [[ewma]]): both materialize ONE key's full event sequence as an
    * in-memory array — the right shape for a strict sequential
    * recurrence, but a single pathological key (a bot user with 10⁸
    * events) would OOM an executor with no indication of which key did
    * it. The guard turns that into a fail-fast, diagnosable error at a
    * configurable bound. 10M struct entries ≈ a few hundred MB — near
    * the practical per-task ceiling; raise it only with executor memory
    * to match, or pre-aggregate/trim the offending key upstream. */
  val DefaultMaxEventsPerKey: Int = 10000000

  /** Wrap a collected per-key sequence so exceeding `maxEvents` raises a
    * descriptive error (key + count) instead of exhausting memory much
    * later in the fold. The guard is a row-local branch on the already-
    * computed array size — zero cost for healthy keys and it cannot
    * perturb the fold's arithmetic. */
  private def guarded(seqCol: Column, keyCol: Column, maxEvents: Int,
      op: String): Column =
    when(size(seqCol) <= maxEvents, seqCol)
      .otherwise(raise_error(concat(
        lit(s"$op: key "), keyCol.cast("string"),
        lit(" has "), size(seqCol).cast("string"),
        lit(s" events, over the maxEventsPerKey bound $maxEvents — " +
          "an executor-memory hazard; trim or pre-aggregate the key, " +
          "or raise the bound with matching executor memory"))))

  /** Strict-order funnel: a user reaches step `i` when they performed
    * steps `0..i` in time order (each step at or after the moment the
    * previous step was first reached). Returns one row per step:
    * `(step, step_name, users)` with `users` = how many users reached it.
    *
    * ONE shuffle on the user key: the log is filtered to the funnel's
    * event types, collected per user as `(ts, step)` pairs, sorted
    * in-group (cost bounded by events-per-user, not log size), and
    * folded once with `aggregate` to the furthest step reached — all
    * codegen'd column algebra, no window, no self-join per step (the
    * textbook N-way-join funnel shuffles the log once PER STEP).
    */
  def funnel(events: DataFrame, userCol: String, timeCol: String,
      typeCol: String, steps: Seq[String],
      maxEventsPerKey: Int = DefaultMaxEventsPerKey): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    require(maxEventsPerKey > 0, "maxEventsPerKey must be positive")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc)
      }
    val reach = events
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol).as("u"),
        struct(col(timeCol).as("ts"), stepIdx.as("step")).as("e"))
      .groupBy(col("u"))
      .agg(array_sort(collect_list(col("e"))).as("es0"))
      .select(col("u"),
        guarded(col("es0"), col("u"), maxEventsPerKey, "funnel").as("es"))
      // fold: state = number of consecutive steps already reached; an
      // event advances it iff it is exactly the next step in order.
      // Sorting by (ts, step) makes the equal-timestamp case
      // deterministic and matches the oracle's `ts >= t_prev` replay.
      .select(aggregate(col("es"), lit(0),
        (st, e) => when(e.getField("step") === st, st + 1).otherwise(st))
        .as("reach"))
    val stepSums = steps.indices.map(i =>
      sum((col("reach") > i).cast("long")).as(s"s$i"))
    val counts = reach.agg(stepSums.head, stepSums.tail: _*)
    // step names are caller data, not SQL — escape BOTH the backslash
    // (Spark's string-literal parser interprets \t, and a trailing \
    // breaks or restructures the generated SQL) and the single quote
    def sqlStringLit(s: String): String =
      s.replace("\\", "\\\\").replace("'", "''")
    val stackArgs = steps.indices
      .map(i => s"$i, '${sqlStringLit(steps(i))}', s$i").mkString(", ")
    counts
      .select(expr(s"stack(${steps.size}, $stackArgs) " +
        "as (step, step_name, users)"))
      .orderBy("step")
  }

  /** Cohort retention: users are grouped into cohorts by the period of
    * their first event; for each (cohort, period-offset) cell, how many
    * of that cohort's users were active. Returns
    * `(cohort, offset, active_users)`, offset in periods since the
    * cohort period (offset 0 = the cohort period itself).
    *
    * Shape: cohorts come from one `groupBy(user).min(ts)` (partial
    * aggregation collapses each map partition to one row per user);
    * activity is the distinct (user, period) set — also a partial-agg
    * reduction; the two reduced sides join on the user id and the
    * final cell count aggregates per (cohort, offset). The raw log is
    * read once per side and never sorted. The cohort side cannot
    * broadcast at real scale (one row per user), so the join shuffles
    * both reduced sides on the user id — bucket the log by user id
    * (operators/Bucketing.scala) to make both reductions and the join
    * exchange-free.
    */
  def cohortRetention(events: DataFrame, userCol: String, timeCol: String,
      period: String = "week"): DataFrame = {
    val cohorts = events.groupBy(col(userCol).as("u"))
      .agg(date_trunc(period, min(col(timeCol))).as("cohort"))
    val activity = events
      .select(col(userCol).as("u"),
        date_trunc(period, col(timeCol)).as("p"))
      .distinct()
    val periodDays = period.toLowerCase match {
      case "week" => 7L
      case "day" => 1L
      case other => throw new IllegalArgumentException(
        s"unsupported retention period: $other (use day or week)")
    }
    activity.join(cohorts, "u")
      .select(col("cohort"),
        (datediff(col("p"), col("cohort")) / periodDays)
          .cast("long").as("offset"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort", "offset")
  }

  /** Gap-fill a keyed time series onto a regular bucket grid with
    * forward fill: for each key, every `hour` bucket between that key's
    * first and last event appears exactly once, carrying the last
    * observed value at or before the bucket (ties within a bucket break
    * by (ts, tieCol) — the latest wins), plus `is_gap` marking buckets
    * with no event of their own.
    *
    * Shape: the raw log collapses FIRST through a per-(key, bucket)
    * aggregation (`max(struct(ts, tie, value))` — one partial-agg
    * shuffle bounded by keys×buckets, the last-writer-wins pick rides
    * the same hash aggregate, no window over raw events); the bucket
    * grid explodes from per-key min/max bounds (`sequence`, rows =
    * buckets, not events); the grid left-joins the observed buckets on
    * (key, bucket) and one per-key window applies `last(_, ignoreNulls
    * = true)`. Everything downstream of the first reduction is sized
    * by the grid. Dense grids for long-lived keys are the known risk
    * at scale — bound the fill horizon upstream (filter the log to the
    * window of interest) rather than asking for years of hourly rows.
    */
  def gapFillHourly(events: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val bucket = date_trunc("hour", col(timeCol))
    val observed = events
      .select(col(keyCol).as("k"), bucket.as("h"),
        struct(col(timeCol).as("ts"), col(tieCol).as("tie"),
          col(valueCol).as("v")).as("e"))
      .groupBy("k", "h")
      .agg(max(col("e")).getField("v").as("v_obs"))
    val grid = observed.groupBy("k")
      .agg(sequence(min(col("h")), max(col("h")),
        expr("INTERVAL 1 HOUR")).as("hs"))
      .select(col("k"), explode(col("hs")).as("h"))
    val w = Window.partitionBy("k").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the observed value rides inside a STRUCT so "bucket had an event
    // whose value is NULL" stays distinguishable from "no event in
    // bucket" (a left-join miss nulls the whole struct): is_gap means
    // NO EVENT, an observed NULL is reported as such (not overwritten
    // by the previous hour's fill), and the fill carries the last
    // OBSERVED value — null included — across true gaps
    grid.join(observed.withColumn("__obs", struct(col("v_obs"))),
        Seq("k", "h"), "left")
      .select(col("k"), col("h"),
        last(col("__obs"), ignoreNulls = true).over(w)
          .getField("v_obs").as("value"),
        col("__obs").isNull.as("is_gap"))
      .orderBy("k", "h")
  }

  /** Per-key exponentially weighted moving average in event order:
    * `s_1 = x_1`, `s_n = α·x_n + (1-α)·s_{n-1}` — the standard
    * smoothing/feature primitive for metric streams. One shuffle on the
    * key (the same collect-sort-fold shape as [[funnel]]): per-key state
    * is the event list, bounded by events-per-key, and the fold is a
    * strict left-to-right sequential recurrence — which is exactly why
    * it is NOT expressible as a commutative aggregate and earns the
    * array fold.
    *
    * Cross-engine exactness: the fold evaluates `(α·x) + ((1-α)·s)` in
    * a fixed operation order over the (ts, tie)-sorted sequence, so an
    * engine replaying the same ordered fold (DuckDB
    * `list_reduce(list(v ORDER BY ts, tie), ...)`) produces bitwise-
    * identical doubles — no rounding policy needed. Returns one row per
    * key: (key, n_events, ewma). */
  def ewma(events: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, valueCol: String, alpha: Double,
      maxEventsPerKey: Int = DefaultMaxEventsPerKey): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(maxEventsPerKey > 0, "maxEventsPerKey must be positive")
    val seq0 = events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col(timeCol).as("t"),
          col(tieCol).as("tie"), col(valueCol).cast("double").as("v"))))
          .as("__seq0"))
      .withColumn("__seq",
        guarded(col("__seq0"), col(keyCol), maxEventsPerKey, "ewma"))
      .withColumn("__vs", transform(col("__seq"), e => e.getField("v")))
    seq0
      .withColumn("ewma", aggregate(
        slice(col("__vs"), lit(2), size(col("__vs")) - 1),
        element_at(col("__vs"), 1),
        (s, x) => lit(alpha) * x + lit(1.0 - alpha) * s))
      .drop("__seq0", "__seq", "__vs")
  }

  /** Holt's linear-trend (double exponential) smoothing per key: the
    * EWMA's forecasting sibling, carrying (level, trend) state —
    *   l' = α·x + (1−α)(l + b);  b' = β(l' − l) + (1−β)b
    * initialized at (x₁, 0). Emits the converged level/trend and the
    * one-step-ahead forecast l + b.
    *
    * Same shape as [[ewma]]: ONE shuffle (the per-key collect), an
    * in-row time-sorted fold with a struct accumulator, the hot-key
    * guard bounding per-key memory. The identical fold replays in the
    * oracle as a DuckDB `list_reduce` over a struct — double-typed
    * constants on both sides keep the recurrence bit-identical.
    */
  def holtForecast(events: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, valueCol: String, alpha: Double, beta: Double,
      maxEventsPerKey: Int = DefaultMaxEventsPerKey): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(beta >= 0 && beta <= 1, "beta must be in [0, 1]")
    val seq0 = events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col(timeCol).as("t"),
          col(tieCol).as("tie"), col(valueCol).cast("double").as("v"))))
          .as("__seq0"))
      .withColumn("__seq",
        guarded(col("__seq0"), col(keyCol), maxEventsPerKey, "holt"))
      .withColumn("__vs", transform(col("__seq"), e => e.getField("v")))
    val lNext = (acc: Column, x: Column) =>
      lit(alpha) * x + lit(1.0 - alpha) * (acc("l") + acc("b"))
    seq0
      .withColumn("__st", aggregate(
        slice(col("__vs"), lit(2), size(col("__vs")) - 1),
        struct(element_at(col("__vs"), 1).as("l"), lit(0.0d).as("b")),
        (acc, x) => struct(
          lNext(acc, x).as("l"),
          (lit(beta) * (lNext(acc, x) - acc("l")) +
            lit(1.0 - beta) * acc("b")).as("b"))))
      .select(col(keyCol), col("n_events"),
        round(col("__st.l"), 6).as("level"),
        round(col("__st.b"), 6).as("trend"),
        round(col("__st.l") + col("__st.b"), 6).as("forecast"))
  }
}
