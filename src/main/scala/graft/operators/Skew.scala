package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators. AQE's skew-join handling covers joins at
  * runtime; for low-cardinality/heavy-hitter aggregations the classic fix
  * is salting: spread each hot key over `buckets` reducers with a random
  * salt, partially aggregate, then merge the partials. Two shuffles, but
  * each is balanced — at 100 TB an unsalted groupBy over a 5-value key
  * would route everything to 5 reducers.
  */
object Skew {

  /** Two-stage salted aggregation: count + sum(valueCol) per key.
    * Deterministic results (the salt only routes rows; partial sums are
    * rounded after the final merge, not per bucket). */
  def saltedCountSum(
      df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), round(sum(col("__s")), 2).as("sum_value"))
  }

  /** Salted distinct-count: exact, via per-bucket pre-dedup then global
    * dedup — each shuffle carries only distinct (key, value) pairs. */
  def saltedCountDistinct(
      df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame = {
    df.select(col(keyCol), col(valueCol))
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__vs"))
      .select(col(keyCol), explode(col("__vs")).as("__v"))
      .groupBy(col(keyCol))
      .agg(countDistinct(col("__v")).as("n_distinct"))
  }
}
