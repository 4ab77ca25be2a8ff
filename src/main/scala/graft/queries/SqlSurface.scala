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
    spark.sql(query)
  }

  /** SQL text shared verbatim between the Spark run and the DuckDB
    * oracle. Restricted to the ANSI intersection both engines parse. */
  private val sharedSql: Map[String, String] = Map(
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

    // CASE + HAVING + grouped expression
    "q_sql_order_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY bucket HAVING count(*) > 10
        |ORDER BY bucket""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sharedSql.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, text))
    } ++ Map[String, (SparkSession, String) => DataFrame](
      // exact interpolated quantiles (both engines use linear
      // interpolation; the function is spelled differently)
      "q_quantiles" -> ((s, dir) => sql(s, dir,
        """SELECT l_returnflag,
          |  round(percentile(l_quantity, 0.5), 4) AS median_qty,
          |  round(percentile(l_quantity, 0.9), 4) AS p90_qty,
          |  round(percentile(l_extendedprice, 0.5), 2) AS median_price
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

      // the custom codegen'd Catalyst expression through the SQL surface;
      // the oracle replicates its closed-form from DuckDB's levenshtein()
      "q_sql_lev_sim" -> ((s, dir) => sql(s, dir,
        """SELECT c_custkey,
          |  round(lev_sim(c_name, 'Customer#000000100', 5.0, 10.0), 6) AS sim
          |FROM customer ORDER BY c_custkey""".stripMargin)))

  val oracles: Map[String, String] = sharedSql ++ Map(
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

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
