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
    *
    * Determinism contract, stated precisely: the salt only ROUTES rows
    * (it never changes what is aggregated), so counts and sums of
    * integer/decimal values are exactly deterministic. Sums of DOUBLES
    * are deterministic only up to floating-point association — the
    * salt derives from monotonically_increasing_id, which is stable
    * for a fixed input layout and under task retry, but a different
    * split count re-routes rows and re-associates the partial sums at
    * the last-ulp level (true of any distributed double sum, salted or
    * not). Callers needing hash-exact double output should quantize to
    * an integer grid before summing (the repo's float-parity rule); the
    * final round(2) here masks association noise only off rounding
    * boundaries. */
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

  /** Salted equi-join for skewed LEFT keys that are too big to broadcast
    * around: each left row gets a deterministic salt in [0, buckets), and
    * each RIGHT row is replicated into every salt bucket — so a hot key's
    * rows spread over `buckets` reducers instead of collapsing onto one.
    * Result is exactly the plain inner equi-join (the salt only routes).
    *
    * Use when BOTH sides are too large to broadcast and AQE's runtime
    * skew split cannot help (e.g. a single key holding >1 reducer's
    * worth of data on both sides of a sort-merge join). Right-side
    * replication costs `buckets`× the right table's shuffle volume —
    * pick `buckets` ~ (hot-key rows / healthy-partition rows), and
    * pre-filter the right side to the join's key range. The salt is
    * derived from a row hash, not rand(): retried tasks re-salt
    * identically, so the join stays exactly-once under task retry. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      buckets: Int = 8): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l("__salt") === r("__salt") &&
        l(keyCol) === r(keyCol), "inner")
      .drop("__salt")
      .drop(r(keyCol))
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
