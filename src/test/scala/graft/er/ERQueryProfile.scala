package graft.er

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.{ConstantSimilarity, LevenshteinSimilarity}
import graft.er.model._

/** Scratch phase-profiler for the q_er_pipeline gate query (not a test).
  * Run: sbt "Test/runMain graft.er.ERQueryProfile [sfDir]" */
object ERQueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "16384")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val base = s.read.parquet(s"$dir/customer.parquet")
      .orderBy(col("c_custkey")).limit(300)
      .select(col("c_custkey").cast("string").as("rid"),
        upper(substring(col("c_name"), -8, 8)).as("name"),
        col("c_nationkey").cast("string").as("nation"),
        col("c_mktsegment").as("segment"))
    val dups = base.filter(col("rid").cast("long") % 5 === 0)
      .select(concat(col("rid"), lit("-dup")).as("rid"),
        concat(substring(col("name"), 1, 2), lit("X"),
          substring(col("name"), 4, 100)).as("name"),
        col("nation"), col("segment"))
    val records = base.unionAll(dups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("records.count")(records.count())

    val prior = BetaParams(0.5, 50.0)
    val specs = Seq(
      AttributeSpec("name", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("nation", ConstantSimilarity, prior),
      AttributeSpec("segment", ConstantSimilarity, prior))
    time("ModelIndex.build") {
      ModelIndex.build(s, records.withColumn("__file",
        org.apache.spark.sql.functions.lit("0")), "__file", specs)
    }
    val init = time("initialize") {
      ERState.initialize(s, records, "rid", None, specs,
        _ => SinglePartition, seed = 42L)
    }
    val result = time("sampler 16 sweeps/4 jobs") {
      Sampler.run(init, numSweeps = 16, burnIn = 4, thin = 4, sweepsPerJob = 4)
    }
    time("analysis") {
      val smpc = Analysis.sharedMostProbableClusters(result.chain.get)
      val pred = Analysis.membershipFromClusters(smpc.select("records"), "records")
      val truth = records.select(col("rid").as("recordId"),
        regexp_replace(col("rid"), "-dup$", "").as("clusterId"))
      Analysis.pairwiseMetrics(pred, truth, "recordId", "clusterId").collect()
    }
    s.stop()
  }
}
