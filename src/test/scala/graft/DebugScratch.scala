package graft

// Scratch main for ad-hoc debugging. sbt "Test/runMain graft.DebugScratch"
object DebugScratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("ERROR")
    val near = graft.er.Analysis.nearMatchMembership(
      Tables.load(spark, "/root/testdata/sf0.01", "part"),
      "p_partkey", Seq("p_brand", "p_type", "p_size"), 1)
    near.groupBy(col("clusterId")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .orderBy("clusterId")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/spark_near")
    spark.stop()
  }
}
