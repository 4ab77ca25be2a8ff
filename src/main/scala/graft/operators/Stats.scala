package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inferential / robust statistics over grouped data — quality gates a
  * training-data pipeline runs before trusting a corpus slice (did the
  * new crawl shift the length distribution? is a source's value column
  * riddled with outliers? are two fields independent?).
  *
  * The reference engine (dblink) stops at descriptive statistics
  * (SURVEY §2.4 A11); these are the inference layer above it. All are
  * single- or two-pass grouped aggregations with broadcast-sized
  * intermediate tables, so they scale with the groupBy, not the data.
  */
object Stats {

  /** Median-absolute-deviation outlier scan per group.
    *
    * Robust alternative to the ±3σ rule (σ is itself corrupted by the
    * outliers it should flag). Two exact-percentile passes: median per
    * group, then the MAD of deviations; a value is an outlier when
    * |v − median| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    * normality). The per-group cutoff table is tiny → broadcast back.
    *
    * Exact medians rank each group's values (one sort per grouped
    * window); at 100 TB swap the exact rank-pick for
    * `approx_percentile` (mergeable sketch) — the gate pins the exact
    * variant so the oracle can replay it. Median and MAD are emitted
    * quantized to the 1e-6 grid as BIGINTs (`median_e6`, `mad_e6`) so
    * the result hashes identically on any engine build.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    // NULL values carry no median information and must not shift the
    // rank picks (gridMedian's row_number would rank them FIRST under
    // Spark's NULLS FIRST default, corrupting the median of the
    // non-null data — the SQL median convention) nor count as rows
    val base = df.filter(v.isNotNull)
    val med = gridMedian(base.select(col(groupCol), v.as("__v")),
        groupCol, "__v")
      .select(col(groupCol), col("__med6"))
    val dev = base.join(broadcast(med), groupCol)
      .withColumn("__medd", col("__med6").cast("double") / lit(1e6))
      .withColumn("__dev", abs(v - col("__medd")))
    val mad = gridMedian(dev.select(col(groupCol), col("__dev")),
        groupCol, "__dev")
      .select(col(groupCol), col("__med6").as("__mad6"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("__med6")).as("median_e6"),
        first(col("__mad6")).as("mad_e6"),
        sum((col("__dev") >
          lit(k * 1.4826) * (col("__mad6").cast("double") / lit(1e6)))
          .cast("long")).as("n_outliers"))
  }

  /** Per-group exact median quantized to the 1e-6 grid as a BIGINT.
    *
    * Deliberately avoids `percentile_cont`: its interpolation
    * arithmetic is engine- and version-specific (`a + f·(b − a)` vs
    * `(1−f)·a + f·b` differ in ulps). Instead both interpolation rows
    * are picked by explicit rank — lo = (n+1) div 2, hi = n div 2 + 1 —
    * and folded as sum/count, which any engine replays bit-identically;
    * the grid quantization then pins the result as an integer.
    */
  private def gridMedian(d: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val vc = col(valueCol)
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(vc)
    val wAll = Window.partitionBy(col(groupCol))
    d.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") === floor((col("__n") + 1) / 2) ||
        col("__rn") === floor(col("__n") / 2) + 1)
      .groupBy(col(groupCol))
      .agg(round(sum(vc) / count(lit(1)) * lit(1e6) + lit(1e-3))
        .cast("long").as("__med6"))
  }

  /** Welch's unequal-variance t-test between two groups of one value
    * column: t statistic and Welch–Satterthwaite degrees of freedom,
    * from a single grouped aggregation (mean + sample variance + count
    * per side — all map-side-combinable, one shuffle of 2 rows).
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"), avg(v).as("m"),
        var_samp(v).as("s2"))
    val a = g.filter(col(groupCol) === groupA)
      .select(col("n").as("na"), col("m").as("ma"), col("s2").as("va"))
    val b = g.filter(col(groupCol) === groupB)
      .select(col("n").as("nb"), col("m").as("mb"), col("s2").as("vb"))
    a.crossJoin(b).select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(col("ma") - col("mb"), 6).as("mean_diff"),
      round((col("ma") - col("mb")) /
        sqrt(col("va") / col("na") + col("vb") / col("nb")), 6).as("t_stat"),
      round(pow(col("va") / col("na") + col("vb") / col("nb"), 2) /
        (pow(col("va") / col("na"), 2) / (col("na") - 1) +
         pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 4).as("dof"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V effect size. One pass builds the
    * contingency counts; the marginals ride a window over that tiny
    * result (|A|·|B| rows), never re-touching the data.
    */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).cast("double").as("o"))
    val wa = Window.partitionBy(col(colA))
    val wb = Window.partitionBy(col(colB))
    val wall = Window.partitionBy()
    val e = counts
      .withColumn("__ra", sum(col("o")).over(wa))
      .withColumn("__cb", sum(col("o")).over(wb))
      .withColumn("__n", sum(col("o")).over(wall))
      .withColumn("__exp", col("__ra") * col("__cb") / col("__n"))
    e.agg(
      first(col("__n")).cast("long").as("n"),
      countDistinct(col(colA)).as("card_a"),
      countDistinct(col(colB)).as("card_b"),
      round(sum(pow(col("o") - col("__exp"), 2) / col("__exp")), 6)
        .as("chi2"))
      .select(col("n"), col("chi2"),
        ((col("card_a") - 1) * (col("card_b") - 1)).as("dof"),
        round(sqrt(col("chi2") / (col("n") *
          least(col("card_a") - 1, col("card_b") - 1))), 6).as("cramers_v"))
  }

  /** Mutual information (bits) between two categorical columns, plus
    * the normalized variant NMI = MI / min(H(A), H(B)). Same shape as
    * [[chiSquare]]: one contingency pass, marginals as windows over the
    * |A|·|B| cell table — the data is touched once.
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val counts = df.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).cast("double").as("c"))
    val wa = Window.partitionBy(col(colA))
    val wb = Window.partitionBy(col(colB))
    val wall = Window.partitionBy()
    val e = counts
      .withColumn("__ra", sum(col("c")).over(wa))
      .withColumn("__cb", sum(col("c")).over(wb))
      .withColumn("__n", sum(col("c")).over(wall))
    e.agg(
      first(col("__n")).cast("long").as("n"),
      round(sum((col("c") / col("__n")) *
        log2(col("c") * col("__n") / (col("__ra") * col("__cb")))), 6)
        .as("mi_bits"),
      // entropies from the SAME cell table: H(A) = log2 n − Σ ra·log2 ra / n
      // summed once per A value — divide each cell's contribution by the
      // row count of its marginal group
      round(log2(first(col("__n"))) -
        sum(col("c") * log2(col("__ra"))) / first(col("__n")), 6).as("__ha"),
      round(log2(first(col("__n"))) -
        sum(col("c") * log2(col("__cb"))) / first(col("__n")), 6).as("__hb"))
      .select(col("n"), col("mi_bits"),
        col("__ha").as("h_a"), col("__hb").as("h_b"),
        round(col("mi_bits") / least(col("__ha"), col("__hb")), 6).as("nmi"))
  }

  /** Benford first-significant-digit conformance scan per group: the
    * observed digit-1..9 distribution of |value|, Benford's expected
    * log10(1+1/d), and the chi-square distance — a data-quality probe
    * for fabricated or truncated numeric columns. One pass (the digit
    * extraction is string algebra on the scan), 9 rows per group.
    */
  def benfordScan(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // first significant digit: print the magnitude as fixed-point (the
    // same %.9f contract DuckDB's printf has), drop zeros and the dot —
    // interior zeros can't affect the FIRST significant digit — and take
    // the lead char. Pure string algebra: no log10-at-power-boundary
    // float hazard.
    val digit = substring(regexp_replace(
      format_string("%.9f", abs(col(valueCol).cast("double"))), "[0.]", ""),
      1, 1).cast("int")
    val counts = df.filter(col(valueCol).isNotNull &&
        abs(col(valueCol).cast("double")) >= 1e-6)
      .groupBy(col(groupCol), digit.as("d"))
      .agg(count(lit(1)).cast("double").as("o"))
    val w = Window.partitionBy(col(groupCol))
    counts
      .withColumn("__n", sum(col("o")).over(w))
      .withColumn("__exp", col("__n") * log(10.0, lit(1.0) + lit(1.0) / col("d")))
      .groupBy(col(groupCol))
      .agg(first(col("__n")).cast("long").as("n"),
        round(sum(pow(col("o") - col("__exp"), 2) / col("__exp")), 6)
          .as("benford_chi2"),
        round(max(abs(col("o") / col("__n") -
          log(10.0, lit(1.0) + lit(1.0) / col("d")))), 6).as("max_dev"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic plus the 1-D earth-mover
    * distance between two groups' empirical distributions:
    * KS = max_x |F_A(x) − F_B(x)|;  EMD = ∫ |F_A − F_B| dx (the
    * closed-form 1-D Wasserstein-1). One grouped count per distinct
    * value, then a single ordered window over the value axis.
    *
    * The window is unpartitioned — the statistic is global — so its
    * input is the DISTINCT-VALUE table, not the data: fine whenever the
    * value domain fits one task (numeric telemetry, doc lengths). For
    * an unbounded domain at 100 TB, pre-bin values to a fixed grid
    * first (the ECDF approximation standard practice uses).
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val perValue = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(v.as("v"))
      .agg(sum((col(groupCol) === groupA).cast("long")).as("ca"),
        sum((col(groupCol) === groupB).cast("long")).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.orderBy(col("v"))
    val tot = perValue.agg(sum(col("ca")).as("__na"), sum(col("cb")).as("__nb"))
    val cdf = perValue
      .withColumn("__fa", sum(col("ca")).over(w))
      .withColumn("__fb", sum(col("cb")).over(w))
      .withColumn("__next_v", lead(col("v"), 1).over(wLead))
      .crossJoin(broadcast(tot))
      .withColumn("__gap", abs(col("__fa") / col("__na") -
        col("__fb") / col("__nb")))
    cdf.agg(
        first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
        max(col("__gap")).as("__ks"),
        sum(when(col("__next_v").isNotNull,
          (col("__next_v") - col("v")) * col("__gap"))
          .otherwise(lit(0.0))).as("__emd"))
      .select(col("n_a"), col("n_b"),
        round(col("__ks") + 1e-9, 6).as("ks"),
        round(col("__emd") + 1e-9, 6).as("emd"))
  }

  /** First-order Markov transition matrix over an event sequence: for
    * each key, consecutive states (ordered by `orderCols`) form
    * (prev → next) transitions; output is the count and conditional
    * probability per (prev, next). One window pass + one aggregation —
    * the sequence never leaves its key's partition.
    */
  def transitionMatrix(df: DataFrame, keyCol: String,
      orderCols: Seq[String], stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev"), col(stateCol).as("next"))
      .agg(count(lit(1)).as("n"))
    val wPrev = Window.partitionBy(col("prev"))
    pairs.withColumn("p",
      round(col("n") / sum(col("n")).over(wPrev) + 1e-9, 6))
  }

  /** Kaplan–Meier survival estimator over right-censored durations:
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with dᵢ deaths and nᵢ at-risk at
    * each distinct event time. Censored subjects leave the risk set
    * without a death term. One grouped count per distinct time + one
    * ordered window — the curve table is |distinct times| rows, not
    * |subjects|.
    *
    * Each per-step factor is quantized to the 1e-6 grid as an INTEGER
    * and the running product is a sequential left fold over the
    * window-ordered factor list — no ln/exp (libm varies across engine
    * builds) and no decimal-scale rounding (varies across DuckDB
    * versions) touches the curve, so any engine replays it
    * bit-identically. A full-death step (d = n_risk) quantizes to
    * factor 0 and zeroes the curve exactly from there on. `survival_e6`
    * is the curve in integer micro-units.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val t = col(durationCol).cast("long")
    val ev = col(eventCol).cast("int")
    val byTime = df.groupBy(t.as("t"))
      .agg(sum(ev).cast("long").as("d"),
        count(lit(1)).as("c"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byTime
      .withColumn("__removed_before",
        coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__n"))))
      .withColumn("n_risk", col("__n") - col("__removed_before"))
      .filter(col("d") > 0)
      .withColumn("__f6",
        round((lit(1.0) - col("d").cast("double") / col("n_risk"))
          * lit(1e6) + lit(1e-3)).cast("long"))
      .withColumn("__fd", col("__f6").cast("double") / lit(1e6))
      .withColumn("__surv",
        aggregate(collect_list(col("__fd")).over(w), lit(1.0d),
          (acc, x) => acc * x))
      .select(col("t"), col("d").as("deaths"), col("n_risk"),
        round(col("__surv") * lit(1e6) + lit(1e-3)).cast("long")
          .as("survival_e6"))
  }

  /** Exact rolling median of the trailing `window` rows per key (value
    * ordered by `orderCols`). The trailing slice rides a ROWS window as
    * a bounded array (window is a small constant), sorted in-row — no
    * second shuffle, no UDF; even-length slices interpolate (mean of
    * the two middles), matching `quantile_cont` semantics.
    */
  def rollingMedian(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val arr = sort_array(collect_list(col(valueCol).cast("double")).over(w))
    val n = size(arr)
    val lo = element_at(arr, floor((n + 1) / 2).cast("int"))
    val hi = element_at(arr, floor(n / 2).cast("int") + 1)
    df.withColumn("rolling_median", (lo + hi) / 2.0)
  }
}
