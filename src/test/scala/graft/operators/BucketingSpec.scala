package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without Exchange and match the shuffle join") {
    val orders = (1L to 500L).map(k => (k, s"o$k")).toDF("key", "oval")
    val items = (1L to 2000L).map(i => (i % 500 + 1, s"i$i"))
      .toDF("key", "ival")

    Bucketing.writeBucketed(orders, "b_orders", "key", 8)
    Bucketing.writeBucketed(items, "b_items", "key", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the co-location (not a broadcast) is what
      // removes the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedEquiJoin(spark, "b_orders", "b_items", "key")
      assert(Bucketing.isShuffleFree(joined),
        "bucketed join plan must contain no Exchange:\n" +
          joined.queryExecution.executedPlan.toString)

      // same result as the plain shuffle join
      val expect = orders.join(items, "key").count()
      assert(joined.count() == expect)

      // a grouped aggregation on the bucket key is shuffle-free too
      val agg = spark.table("b_items").groupBy("key")
        .agg(count(lit(1)).as("n"))
      assert(Bucketing.isShuffleFree(agg),
        "bucketed groupBy must contain no Exchange:\n" +
          agg.queryExecution.executedPlan.toString)

      // NEGATIVE control: the detector must SEE a real shuffle (under
      // AQE the top plan is an AdaptiveSparkPlanExec leaf — a walk that
      // does not descend into it returns true for every DataFrame, and
      // both assertions above pass vacuously)
      val unbucketed = orders.join(items, "key")
      assert(!Bucketing.isShuffleFree(unbucketed),
        "plain shuffle join must NOT report shuffle-free")
      assert(!Bucketing.isShuffleFree(
        orders.repartition(4, col("key"))),
        "explicit repartition must NOT report shuffle-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
