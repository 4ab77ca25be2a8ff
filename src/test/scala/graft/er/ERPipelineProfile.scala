package graft.er

import org.apache.spark.sql.functions._

import graft.er.model._

/** Phase-level wall-clock split of the q_er_pipeline gate (init /
  * chain / metrics) — a profiling aid for keeping the gate under its
  * bench budget. Mirrors queries/Clustering.erPipeline exactly.
  *
  * Run: sbt "Test/runMain graft.er.ERPipelineProfile [sfDir]"
  */
object ERPipelineProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"== $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the parquet reader + codegen paths so phase numbers are not
    // first-job noise
    s.read.parquet(s"$dir/customer.parquet").count()

    val base = s.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").cast("string").as("rid"),
        upper(substring(col("c_name"), -8, 8)).as("name"),
        col("c_nationkey").cast("string").as("nation"),
        col("c_mktsegment").as("segment"))
    val exactDups = base.filter(col("rid").cast("long") % 10 === 0)
      .select(concat(col("rid"), lit("-dup")).as("rid"),
        col("name"), col("nation"), col("segment"))
    val distortedDups = base.filter(col("rid").cast("long") % 10 === 5)
      .select(concat(col("rid"), lit("-dup")).as("rid"),
        concat(substring(col("name"), 1, 2), lit("X"),
          substring(col("name"), 4, 100)).as("name"),
        col("nation"), col("segment"))
    val records = base.unionAll(exactDups).unionAll(distortedDups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val prior = BetaParams(0.5, 50.0)
    val specs = Seq(
      AttributeSpec("name", graft.core.LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("nation", graft.core.ConstantSimilarity, prior),
      AttributeSpec("segment", graft.core.ConstantSimilarity, prior))

    val init = t("init") {
      ERState.initialize(s, records, "rid", None, specs,
        _ => SinglePartition, seed = 42L)
    }
    val result = t("chain") {
      Sampler.run(init, numSweeps = 16, burnIn = 4, thin = 4,
        sweepsPerJob = 4)
    }
    val out = t("metrics") {
      val smpc = Analysis.sharedMostProbableClusters(result.chain.get,
        result.diagnostics.size.toDouble)
      val pred = Analysis.membershipFromClusters(
          smpc.select("records"), "records")
      val truth = records.select(col("rid").as("recordId"),
        regexp_replace(col("rid"), "-dup$", "").as("clusterId"))
      val pmAri = Analysis.clusteringMetrics(pred, truth, "recordId", "clusterId")
      val counts = records.agg(count(lit(1)).as("n_records"),
        sum(col("rid").endsWith("-dup").cast("long")).as("n_truth_pairs"))
      pmAri.crossJoin(counts).collect().toSeq
    }
    println(out.mkString("\n"))
    s.stop()
  }
}
