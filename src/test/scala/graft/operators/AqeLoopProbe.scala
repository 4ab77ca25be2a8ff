package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does AQE help or hurt the driver-paced graph loops? Each loop round
  * is a small multi-stage job; AQE re-plans per exchange, which adds
  * driver latency that dominates at gate-scale |V|.
  *
  * sbt "Test/runMain graft.operators.AqeLoopProbe [sfDir]"
  */
object AqeLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("sk"))).as("sks"))
      .where(size(col("sks")) > 1)
      .select(col("sks"), concat(slice(col("sks"), 2, Int.MaxValue),
        slice(col("sks"), 1, 1)).as("nxts"))
      .select(explode(arrays_zip(col("sks"), col("nxts"))).as("z"))
      .select(col("z.sks").as("src"), col("z.nxts").as("dst"))
      .localCheckpoint(true)
    val seeds = edges.select(col("src").as("node"))
      .where(col("node") % 100 === 0).distinct()
    for (aqe <- Seq("true", "false", "true", "false"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      PageRank.run(edges, 3).count()
      val t1 = System.nanoTime()
      ShortestPaths.hopDistances(edges, seeds, 3).count()
      val t2 = System.nanoTime()
      println(f"[aqeloop] aqe=$aqe%-5s rep=$rep pagerank ${(t1 - t0) / 1e9}%5.2f s" +
        f"  bfs ${(t2 - t1) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
