package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The generic SQL query surface: every testdata table registered as a
  * temp view, arbitrary ANSI SQL through Catalyst. The gate queries run
  * the *identical* SQL text on Spark and DuckDB — the strongest parity
  * statement the engine can make (parser + optimizer + executor).
  */
object SqlSurface {

  /** Register (or refresh) all tables for a scale-factor dir as views. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    graft.functions.LevenshteinSim.register(spark)
    graft.functions.JaroWinkler.register(spark)
    graft.functions.DamerauLevenshtein.register(spark)
    spark.sql(query)
  }

  /** SQL text shared verbatim between the Spark run and the DuckDB
    * oracle. Restricted to the ANSI intersection both engines parse. */
  private val sharedSql: Map[String, String] = Map(
    // exact DECIMAL arithmetic: double prices pinned to DECIMAL(12,2)
    // sum EXACTLY on both engines — no float fuzz. Every output is an
    // INTEGER (cents / micro-units): decimal sums scaled by 100 are
    // integral so the BIGINT cast is exact, and the average avoids
    // avg(DECIMAL) entirely (its result scale and rounding mode differ
    // across engines) — exact sum → double → explicit 1e6 multiply →
    // scale-0 round, which every engine build computes identically
    "q_sql_decimal" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100
        |    AS BIGINT) AS sum_price_cents,
        |  CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
        |    AS DOUBLE) * 1e6 / count(*)) AS BIGINT) AS avg_qty_e6,
        |  CAST(min(CAST(l_discount AS DECIMAL(4,2))) * 100 AS BIGINT)
        |    AS min_disc_cents
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // three-valued-logic surface over planted NULLs: count(col) vs
    // count(*), null-safe IS NOT DISTINCT FROM, coalesce, and
    // NULLS-FIRST ordering — all integer-exact (no float aggregates)
    "q_sql_null_semantics" ->
      """WITH t AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE CAST(value AS DOUBLE) END AS v
        |  FROM events WHERE user_id < 20)
        |SELECT user_id, count(*) AS n_rows, count(v) AS n_vals,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  CAST(sum(CASE WHEN v IS NOT DISTINCT FROM NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
        |  round(min(coalesce(v, 999999.0)) + 1e-9, 6) AS min_or_sentinel,
        |  round(max(v) + 1e-9, 6) AS max_ignoring_nulls
        |FROM t GROUP BY user_id
        |ORDER BY n_nulls DESC NULLS FIRST, user_id""".stripMargin,

    // TRUE Damerau-Levenshtein (unrestricted transpositions) — our
    // codegen expression registered under the same name and semantics
    // as DuckDB's native damerau_levenshtein, so ONE SQL text runs on
    // both engines and the DP kernel is checked cell-exact
    "q_sql_damerau" ->
      """SELECT p_partkey,
        |  CAST(damerau_levenshtein(p_name, 'small polished rings')
        |    AS INTEGER) AS dl,
        |  CAST(damerau_levenshtein(substr(p_name, 1, 8),
        |    substr(reverse(p_name), 1, 8)) AS INTEGER) AS dl_rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    // datetime algebra in the ANSI intersection: date_trunc + extract
    // (casts pin the cross-engine result types — DuckDB's date_trunc
    // returns DATE at month granularity and extract returns BIGINT,
    // Spark TIMESTAMP and INT)
    "q_sql_datetime" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS mon, event_type,
        |  count(*) AS n,
        |  CAST(min(extract(day FROM ts)) AS INTEGER) AS first_dom,
        |  CAST(max(extract(hour FROM ts)) AS INTEGER) AS max_hour,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS INTEGER) AS n_days
        |FROM events GROUP BY mon, event_type
        |ORDER BY mon, event_type""".stripMargin,

    // ANSI FILTER clause on aggregates: per-group conditional
    // aggregation without CASE scaffolding
    "q_sql_filter_clause" ->
      """SELECT l_returnflag, count(*) AS n,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
        |    AS disc_rev,
        |  count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')
        |    AS n_supp_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // TPC-H Q3 flavor: join + agg + top-N with deterministic tie-break
    "q_sql_shipping_priority" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    // correlated scalar subquery
    "q_sql_above_avg_balance" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer
        |                   WHERE c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    // grouping sets: subtotal + grand-total rows via ROLLUP (absent in the
    // reference; SURVEY §2.4 "free via Catalyst")
    "q_sql_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // CUBE grouping sets with GROUPING() disambiguation (a NULL flag vs
    // a NULL data value) — complements the ROLLUP gate above
    "q_sql_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls,
        |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    // for: two one-dimension margins plus the grand total, WITHOUT the
    // (rf, ls) cross cells a CUBE would add. GROUPING() flags
    // disambiguate margin NULLs from data NULLs, as in the CUBE gate.
    "q_sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls,
        |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // NTILE bucketing over a total order (unique tie-break key makes
    // the quartile assignment deterministic in both engines)
    "q_sql_ntile" ->
      """WITH q AS (
        |  SELECT c_custkey, c_acctbal,
        |    ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer)
        |SELECT quartile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
        |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin,

    // correlated EXISTS / NOT EXISTS subqueries
    "q_sql_exists" ->
      """SELECT s_suppkey, s_name
        |FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey
        |                AND l.l_quantity >= 50)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
        |                  WHERE l2.l_suppkey = s.s_suppkey
        |                    AND l2.l_tax > 0.07 AND l2.l_quantity < 2)
        |ORDER BY s_suppkey""".stripMargin,

    // recursive CTE (Spark 4's UnionLoop execution): hierarchy walk over
    // the deterministic decimal-digit tree parent(k) = floor(k / 10) —
    // each iteration is one hash join of the frontier against customer,
    // so at warehouse scale the recursion is as deep as the key space is
    // wide (4-5 levels), never row-count-deep. The k >= 10 guard excludes
    // the root's parent(0) = 0 self-loop that would never terminate.
    "q_sql_recursive_tree" ->
      """WITH RECURSIVE tree(k, depth, bal) AS (
        |  SELECT c_custkey, 0, c_acctbal FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1, c.c_acctbal
        |  FROM customer c JOIN tree t
        |    ON CAST(floor(c.c_custkey / 10) AS BIGINT) = t.k
        |  WHERE c.c_custkey >= 10)
        |SELECT depth, count(*) AS n, min(k) AS min_key, max(k) AS max_key,
        |  round(sum(bal), 2) AS sum_bal
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,

    // correlated LATERAL subquery with ORDER BY + LIMIT: per-group top-N
    // as a join operand (the relational form of the top-1-per-key family;
    // Spark plans it as a broadcast outer over the 25-row nation side)
    "q_sql_lateral_topn" ->
      """SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_custkey""".stripMargin,

    // ANSI three-valued IN/NOT IN: the WHERE subquery is null-free, so
    // NOT IN plans as a plain anti join with ANSI-identical semantics;
    // the projected IN list carries a literal NULL, so maybe_in is TRUE
    // on a match and NULL (never FALSE) otherwise — Spark's In expression
    // is three-valued. Deliberately NOT the *subquery* form in the
    // projection: Spark's ExistenceJoin rewrite returns FALSE where ANSI
    // (and DuckDB) say NULL — `SELECT 5 IN (SELECT CAST(NULL AS INT))` is
    // false on Spark 4.1.2, NULL on DuckDB — a measured engine deviation
    // a shared-text gate cannot bridge.
    "q_sql_not_in_nulls" ->
      """SELECT s_suppkey, s_name,
        |  (s_nationkey IN (0, 1, 2, NULL)) AS maybe_in
        |FROM supplier
        |WHERE s_suppkey NOT IN
        |  (SELECT l_suppkey FROM lineitem
        |   WHERE l_quantity >= 50 AND l_tax > 0.07)
        |ORDER BY s_suppkey""".stripMargin,

    // navigation + distribution window-function suite over a named
    // WINDOW clause: lag/lead/first_value/last_value (explicit
    // unbounded frame — the default frame stops at CURRENT ROW, a
    // classic silent-wrong-answer), nth_value, percent_rank, cume_dist,
    // and a bounded ROWS frame moving sum. Picks are bit-exact between
    // engines; only the float sum and the rank ratios are rounded.
    "q_sql_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER win AS prev_price,
        |  lead(o_totalprice) OVER win AS next_price,
        |  first_value(o_totalprice) OVER win AS first_price,
        |  last_value(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_price,
        |  nth_value(o_totalprice, 2) OVER win AS second_price,
        |  round(percent_rank() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
        |    AS pr,
        |  round(cume_dist() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
        |    AS cd,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING), 2) AS moving_sum
        |FROM orders
        |WHERE o_custkey % 50 = 7
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // LIMIT/OFFSET pagination over a total order
    "q_sql_offset" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,

    // GROUP BY ALL — the modern grouping shorthand both engines infer
    // identically: every non-aggregate select item becomes a key
    "q_sql_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
        |  CASE WHEN l_discount >= 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus, disc_band""".stripMargin,

    // linear-regression aggregate family (regr_slope / intercept / r2 /
    // count + corr) — single-pass stable co-moment aggregates in both
    // engines; rounded because the co-moments are float-order-sensitive
    "q_sql_regression" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_qp
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // CASE + HAVING + grouped expression
    "q_sql_order_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY bucket HAVING count(*) > 10
        |ORDER BY bucket""".stripMargin,

    // exact interpolated quantiles, spelled as explicit rank
    // interpolation instead of percentile()/quantile_cont() so both
    // engines execute the *same* IEEE operations (the built-ins use
    // different interpolation formulas that differ in the last ulp and
    // flip rounding at decimal boundaries like 52724.245). The +1e-9
    // pushes decimal-exact half-way values consistently up on both
    // engines (Spark rounds the shortest decimal repr, DuckDB the
    // binary value).
    "q_quantiles" ->
      """WITH src AS (
        |  SELECT l_returnflag AS rf, CAST(l_quantity AS DOUBLE) AS v,
        |    0.5 AS p, 'median_qty' AS m FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE),
        |    0.9, 'p90_qty' FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE),
        |    0.5, 'median_price' FROM lineitem),
        |r AS (
        |  SELECT rf, m, p, v,
        |    CAST(row_number() OVER (PARTITION BY rf, m ORDER BY v)
        |      AS DOUBLE) AS rn,
        |    CAST(count(*) OVER (PARTITION BY rf, m) AS DOUBLE) AS n
        |  FROM src),
        |pick AS (
        |  SELECT rf, m,
        |    sum(CASE WHEN rn = floor(1 + (n - 1) * p) THEN v END) AS lov,
        |    sum(CASE WHEN rn = floor(1 + (n - 1) * p) + 1 THEN v END) AS hiv,
        |    max(1 + (n - 1) * p - floor(1 + (n - 1) * p)) AS g
        |  FROM r GROUP BY rf, m),
        |vals AS (
        |  SELECT rf, m, lov + g * (coalesce(hiv, lov) - lov) AS val
        |  FROM pick)
        |SELECT rf AS l_returnflag,
        |  round(max(CASE WHEN m = 'median_qty' THEN val END) + 1e-9, 4)
        |    AS median_qty,
        |  round(max(CASE WHEN m = 'p90_qty' THEN val END) + 1e-9, 4)
        |    AS p90_qty,
        |  round(max(CASE WHEN m = 'median_price' THEN val END) + 1e-9, 2)
        |    AS median_price
        |FROM vals GROUP BY rf ORDER BY rf""".stripMargin,

    // higher statistical moments + mode, spelled as explicit power sums
    // so both engines run the identical IEEE expression tree (the
    // built-in skewness/kurtosis differ in definition — sample vs
    // population — and in summation order). Power sums of integer
    // quantities stay exact in doubles (< 2^53), so the derived
    // moments are bit-identical; mode ties break to the smallest value.
    "q_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    sum(CAST(l_quantity AS DOUBLE)) AS s1,
        |    sum(CAST(l_quantity AS DOUBLE) * l_quantity) AS s2,
        |    sum(CAST(l_quantity AS DOUBLE) * l_quantity * l_quantity) AS s3,
        |    sum(CAST(l_quantity AS DOUBLE) * l_quantity * l_quantity
        |        * l_quantity) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT rf, n, s1 / n AS mu,
        |    s2 / n - (s1 / n) * (s1 / n) AS m2,
        |    s3 / n - 3 * (s1 / n) * (s2 / n)
        |      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4 * (s1 / n) * (s3 / n)
        |      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s),
        |counts AS (
        |  SELECT l_returnflag AS rf, l_quantity AS v, count(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |mode_pick AS (
        |  SELECT rf, v AS mode_qty FROM (
        |    SELECT rf, v,
        |      row_number() OVER (PARTITION BY rf ORDER BY c DESC, v) AS r
        |    FROM counts) t WHERE r = 1)
        |SELECT m.rf AS l_returnflag, CAST(m.n AS BIGINT) AS n,
        |  round(m.mu + 1e-9, 6) AS mean_qty,
        |  round(m.m3 / power(m.m2, 1.5) + 1e-9, 6) AS skewness_qty,
        |  round(m.m4 / (m.m2 * m.m2) - 3 + 1e-9, 6) AS kurtosis_qty,
        |  mode_pick.mode_qty AS mode_qty
        |FROM m JOIN mode_pick ON m.rf = mode_pick.rf
        |ORDER BY l_returnflag""".stripMargin,

    // equi-depth histogram (optimizer-statistics construction): ntile
    // over a deterministic total order gives identical bucket splits in
    // both engines. The global-sort window is the exact-build path; the
    // at-scale alternative (approx_percentile boundaries, mergeable
    // sketch state) is already gated by q_approx_quantiles.
    "q_histogram_equidepth" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS v,
        |    ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS bucket
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n,
        |  round(min(v), 2) AS lo, round(max(v), 2) AS hi
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    // running distinct-count (cumulative users) via the first-seen
    // decomposition: a COUNT DISTINCT window is unsupported/quadratic,
    // but min-date per user + a cumulative sum is two hash shuffles and
    // scales linearly — the standard DAU/MAU-accounting shape.
    "q_cumulative_distinct" ->
      """WITH first_seen AS (
        |  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS d
        |  FROM events GROUP BY user_id)
        |SELECT d, count(*) AS new_users,
        |  CAST(sum(count(*)) OVER (ORDER BY d) AS BIGINT)
        |    AS cum_distinct_users
        |FROM first_seen GROUP BY d ORDER BY d""".stripMargin,

    // market-basket co-occurrence mining: within-order part pairs with
    // min-support. The self-join key (order) has a bounded fan-out
    // (TPC-H <= 7 lines/order), so candidate pairs are O(orders·k²) —
    // the join shuffles on the key and never goes quadratic in parts.
    "q_frequent_pairs" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS support
        |FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY a.pk, b.pk
        |HAVING count(*) >= 2
        |ORDER BY support DESC, part_a, part_b""".stripMargin,

    // autocorrelation function (lags 1-3) of the hourly event-count
    // series: resample-first (cardinality drops to O(hours) before the
    // single-partition lag window), integer counts keep the centered
    // co-moment sums deterministic to the last ulp.
    "q_acf" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS DOUBLE) AS v
        |  FROM events GROUP BY date_trunc('hour', ts)),
        |stats AS (SELECT avg(v) AS mu FROM hourly),
        |lagged AS (
        |  SELECT v, lag(v, 1) OVER (ORDER BY h) AS v1,
        |    lag(v, 2) OVER (ORDER BY h) AS v2,
        |    lag(v, 3) OVER (ORDER BY h) AS v3
        |  FROM hourly)
        |SELECT count(*) AS n_hours,
        |  round(sum((v - mu) * (v1 - mu)) / sum((v - mu) * (v - mu))
        |    + 1e-9, 6) AS acf1,
        |  round(sum((v - mu) * (v2 - mu)) / sum((v - mu) * (v - mu))
        |    + 1e-9, 6) AS acf2,
        |  round(sum((v - mu) * (v3 - mu)) / sum((v - mu) * (v - mu))
        |    + 1e-9, 6) AS acf3
        |FROM lagged CROSS JOIN stats""".stripMargin,

    // CUSUM changepoint detection per event type: the day with the
    // largest |cumulative - expected| deviation of the daily count
    // series. Cumulative sums of integer counts are exact; the single
    // k·mu product is the only rounding site. One shuffle per window
    // partition — no self-joins.
    "q_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)),
        |stats AS (
        |  SELECT event_type, avg(n) AS mu FROM daily GROUP BY event_type),
        |cum AS (
        |  SELECT daily.event_type AS et, d,
        |    sum(n) OVER (PARTITION BY daily.event_type ORDER BY d) AS cn,
        |    CAST(row_number() OVER (PARTITION BY daily.event_type
        |      ORDER BY d) AS DOUBLE) AS k,
        |    mu
        |  FROM daily JOIN stats ON daily.event_type = stats.event_type),
        |dev AS (
        |  SELECT et, d, abs(cn - k * mu) AS dev,
        |    row_number() OVER (PARTITION BY et
        |      ORDER BY abs(cn - k * mu) DESC, d) AS r
        |  FROM cum)
        |SELECT et AS event_type, d AS changepoint_day,
        |  round(dev + 1e-9, 4) AS max_dev
        |FROM dev WHERE r = 1 ORDER BY event_type""".stripMargin,

    // link prediction / collaborative filtering on the customer-part
    // co-purchase bipartite graph: common-neighbor count, Jaccard,
    // cosine and Adamic-Adar per customer pair. The self-join key (part)
    // has bounded fan-out (~30-50 customers/part at every SF, probed),
    // so candidates stay O(parts · deg²) — the df-capped
    // candidate-generate shape, never all-pairs over customers.
    "q_link_prediction" ->
      // Degree and neighborhood size ride ON the edge rows as window
      // counts instead of separate deg/sizes CTEs: Spark inlines every
      // CTE reference, so the old shape derived the (join + DISTINCT)
      // edge set FOUR times and paid three more shuffle joins to attach
      // d/nc; this shape derives it twice (the self-join's two sides)
      // and attaches both counts for free — nc is constant per customer
      // so min() carries it through the pair aggregation (r12, guide
      // §2.4). Same rows, same values: d and nc are the same integers,
      // and every float output carries the same +1e-9 round(…, 6) grid.
      """WITH edges AS (
        |  SELECT c, p,
        |    count(*) OVER (PARTITION BY c) AS nc,
        |    count(*) OVER (PARTITION BY p) AS d
        |  FROM (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)),
        |pairs AS (
        |  SELECT a.c AS cust_a, b.c AS cust_b, count(*) AS common_parts,
        |    round(sum(1.0 / ln(a.d)) + 1e-9, 6) AS adamic_adar,
        |    min(a.nc) AS na, min(b.nc) AS nb
        |  FROM edges a JOIN edges b ON a.p = b.p AND a.c < b.c
        |  GROUP BY a.c, b.c HAVING count(*) >= 4)
        |SELECT cust_a, cust_b, common_parts, adamic_adar,
        |  round(common_parts
        |    / CAST(na + nb - common_parts AS DOUBLE) + 1e-9, 6)
        |    AS jaccard,
        |  round(common_parts
        |    / sqrt(CAST(na AS DOUBLE) * nb) + 1e-9, 6) AS cosine
        |FROM pairs ORDER BY cust_a, cust_b""".stripMargin,

    // Spearman rank correlation per group: average ranks for ties
    // (min-rank + (tie_count-1)/2, exact halves), then the one-pass
    // product-moment formula on ranks — the robust/monotone complement
    // to q_sql_regression's Pearson corr.
    "q_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag AS rf,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (count(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |         - 1) / 2.0 AS rq,
        |    rank() OVER (PARTITION BY l_returnflag
        |        ORDER BY l_extendedprice)
        |      + (count(*) OVER (PARTITION BY l_returnflag,
        |          l_extendedprice) - 1) / 2.0 AS rp
        |  FROM lineitem),
        |s AS (
        |  SELECT rf, CAST(count(*) AS DOUBLE) AS n, sum(rq) AS sx,
        |    sum(rp) AS sy, sum(rq * rq) AS sxx, sum(rp * rp) AS syy,
        |    sum(rq * rp) AS sxy
        |  FROM r GROUP BY rf)
        |SELECT rf AS l_returnflag,
        |  round((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) + 1e-9, 6)
        |    AS spearman_rho
        |FROM s ORDER BY rf""".stripMargin,

    // classical seasonal decomposition of the hourly event-count
    // series: centered 25-hour moving-average trend (full windows
    // only), per-hour-of-day seasonal index from the detrended
    // residuals. Resample-first keeps the window input at O(hours);
    // integer counts make the trend sums exact in both engines.
    "q_seasonal_decompose" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS DOUBLE) AS v
        |  FROM events GROUP BY date_trunc('hour', ts)),
        |tr AS (
        |  SELECT h, v,
        |    avg(v) OVER (ORDER BY h
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend,
        |    count(*) OVER (ORDER BY h
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS wn
        |  FROM hourly)
        |SELECT hour(h) AS hod, count(*) AS n,
        |  round(avg(v - trend) + 1e-9, 4) AS seasonal,
        |  round(avg(v) + 1e-9, 4) AS mean_level
        |FROM tr WHERE wn = 25
        |GROUP BY hour(h) ORDER BY hod""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sharedSql.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, text))
    } ++ Map[String, (SparkSession, String) => DataFrame](
      // SQL PIVOT clause through Catalyst's dedicated parser path (the
      // relational pivot gate q_pivot_status uses the DataFrame API);
      // dialects differ, so the oracle replays it as conditional
      // aggregation rather than sharing text
      "q_sql_pivot" -> ((s, dir) => sql(s, dir,
        """SELECT * FROM (
          |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
          |PIVOT (round(sum(l_quantity), 2)
          |       FOR l_linestatus IN ('F' AS f, 'O' AS o))
          |ORDER BY l_returnflag""".stripMargin)),
      // SQL UNPIVOT clause (Spark 3.4+ syntax) — melt through the
      // parser; oracle replays as UNION ALL
      "q_sql_unpivot" -> ((s, dir) => sql(s, dir,
        """SELECT o_orderpriority, metric, CAST(v AS DOUBLE) AS v FROM (
          |  SELECT o_orderpriority,
          |    round(sum(o_totalprice), 2) AS total_price,
          |    CAST(count(*) AS DOUBLE) AS n_orders
          |  FROM orders GROUP BY o_orderpriority)
          |UNPIVOT (v FOR metric IN (total_price, n_orders))
          |ORDER BY o_orderpriority, metric""".stripMargin)),
      // the custom codegen'd Catalyst expression through the SQL surface;
      // the oracle replicates its closed-form from DuckDB's levenshtein()
      "q_sql_lev_sim" -> ((s, dir) => sql(s, dir,
        """SELECT c_custkey,
          |  round(lev_sim(c_name, 'Customer#000000100', 5.0, 10.0), 6) AS sim
          |FROM customer ORDER BY c_custkey""".stripMargin)),
      // Jaro / Jaro–Winkler codegen expressions vs DuckDB's native
      // implementations — bit-level kernel parity (match window, strict
      // 0.7 boost, 4-char prefix cap) on real word-combo part names.
      "q_jaro_winkler" -> ((s, dir) => sql(s, dir,
        """SELECT p_partkey,
          |  round(jaro_winkler(p_name, 'small rings') + 1e-9, 6) AS jw,
          |  round(jaro_sim(p_name, 'small rings') + 1e-9, 6) AS jaro
          |FROM part ORDER BY p_partkey""".stripMargin)))

  val oracles: Map[String, String] = sharedSql ++ Map(
    "q_sql_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2)
        |    AS f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)
        |    AS o
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_sql_unpivot" ->
      """WITH a AS (
        |  SELECT o_orderpriority,
        |    round(sum(o_totalprice), 2) AS total_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'total_price' AS metric, total_price AS v
        |FROM a
        |UNION ALL
        |SELECT o_orderpriority, 'n_orders', n_orders FROM a
        |ORDER BY o_orderpriority, metric""".stripMargin,

    "q_jaro_winkler" ->
      """SELECT p_partkey,
        |  round(jaro_winkler_similarity(p_name, 'small rings') + 1e-9, 6) AS jw,
        |  round(jaro_similarity(p_name, 'small rings') + 1e-9, 6) AS jaro
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_sql_lev_sim" ->
      """SELECT c_custkey, round(greatest(0.0,
        |    (10.0 * (1.0 - 2.0 * d / (la + lb + d)) - 5.0) * 10.0 / 5.0), 6) AS sim
        |FROM (SELECT c_custkey,
        |        CAST(levenshtein(c_name, 'Customer#000000100') AS DOUBLE) AS d,
        |        length(c_name) AS la,
        |        length('Customer#000000100') AS lb
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin)
}
