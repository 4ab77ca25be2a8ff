package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query entry;
  * `oracleSql` holds the DuckDB-equivalent SQL for each (omitted only for
  * non-SQL-expressible operators, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Clustering.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.SqlSurface.queries ++
      graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Clustering.oracles ++
      graft.queries.Pipeline.oracles ++
      graft.queries.StreamingQueries.oracles ++
      graft.queries.SqlSurface.oracles ++
      graft.queries.Analytics.oracles
}
