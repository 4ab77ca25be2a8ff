package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  // local[threads, maxFailures]: task retries ON (2 attempts) so the
  // fault-injection specs can exercise retry determinism; tests that
  // never fail a task are unaffected.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    // same extension surface as production (Verify/Bench load it too)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // Deep iterative plans (MCMC) otherwise render multi-GB debug strings
    // at persist() time — the string is UI-only, cap it.
    .config("spark.sql.maxPlanStringLength", "16384")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // 131-query suites thrash the default 100-entry codegen class cache
    // (static conf) — see Bench.scala for the measurement
    .config("spark.sql.codegen.cache.maxEntries", "5000")
    .getOrCreate()
}
