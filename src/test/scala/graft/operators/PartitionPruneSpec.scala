package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Partition-pruning proof for the engine's partitioned sinks (the
  * linkage-chain and sample layouts write partitionBy("partitionId") —
  * SURVEY S7; burn-in filters then prune at read time, P2). */
class PartitionPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter on the partition column prunes partitions at the scan") {
    val dir = Files.createTempDirectory("prune").toString
    (0L until 1000L).map(i => (i, (i % 10).toInt, s"v$i"))
      .toDF("id", "partitionId", "payload")
      .write.mode("overwrite").partitionBy("partitionId").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("partitionId") >= 8)
    val plan = pruned.queryExecution.executedPlan.toString

    // the partition filter must reach the scan node, not a post-scan Filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("(partitionId#") &&
      plan.contains(">= 8"), plan.take(2000))
    assert(pruned.count() == 200)
    // only the two matching directories are read
    val files = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(f => f.contains("partitionId=8") || f.contains("partitionId=9")),
      files.mkString("\n"))
  }
}
