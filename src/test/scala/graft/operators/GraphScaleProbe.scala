package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for the graph family: replicate the co-order
  * supplier graph 1x / 2x / 4x as node-id-offset DISJOINT copies (same
  * structure and density, k times the nodes and edges) and time
  * PageRank, personalized PageRank, the triangle census, and BFS hop
  * distances. Disjoint copies make the measurement pure graph-size
  * scaling — no cross-copy edges, no densification.
  *
  * sbt "Test/runMain graft.operators.GraphScaleProbe [sfDir]"
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val baseEdges = li
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("sk"))).as("sks"))
      .where(size(col("sks")) > 1)
      .select(col("sks"), concat(slice(col("sks"), 2, Int.MaxValue),
        slice(col("sks"), 1, 1)).as("nxts"))
      .select(explode(arrays_zip(col("sks"), col("nxts"))).as("z"))
      .select(col("z.sks").as("src"), col("z.nxts").as("dst"))
      .localCheckpoint(true)

    def run(k: Int): Unit = {
      val edges = (0 until k).map { i =>
        baseEdges.select((col("src") + i * 10000000L).as("src"),
          (col("dst") + i * 10000000L).as("dst"))
      }.reduce(_ unionAll _).localCheckpoint(true)
      val nE = edges.count()
      val seeds = edges.select(col("src").as("node"))
        .where(col("node") % 100 === 0).distinct()

      def time(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[graphscale] k=$k edges=$nE $name%-12s " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      }
      time("pagerank")(PageRank.run(edges, 3).count())
      time("ppr")(PageRank.runPersonalized(edges, seeds, 3).count())
      time("triangles")(Triangles.globalCount(edges).count())
      time("bfs3")(ShortestPaths.hopDistances(edges, seeds, 3).count())
    }
    Seq(1, 1, 2, 4).foreach(run) // first k=1 absorbs first-execution JIT
    spark.stop()
  }
}
