package graft

// Plan auditor: prints formatted physical plans for key queries so scan
// pushdown / broadcast / codegen structure can be inspected.
// sbt "Test/runMain graft.PlanAudit [queryName ...]"
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q_scan_filter_project", "q_join_broadcast_dims",
      "q_join_multiway_revenue", "q_top1_per_key", "q_agg_pricing_summary")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
