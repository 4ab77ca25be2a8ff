package graft.er

import java.nio.file.{Files, Paths}

/** Reference-parity artifact for the CANONICAL MEDIUM workload
  * (BASELINE.md): the reference's shipped examples/RLdata10000.csv
  * (10,000 records, 10% duplicates, NA missing values) under its
  * shipped RLdata10000.conf semantics verbatim through the S6 HOCON
  * loader — 1000 sweeps, thin 10, seed 319158, PCG-I, Beta(10, 1000)
  * distortion priors, 2 KD-tree partitions on fname_c1, evaluate
  * cutoff 100. Only the two filesystem paths are re-pointed.
  *
  * Prints the diagnostics-CSV header, the pairwise/cluster evaluation
  * vs the ent_id ground truth, and wall-clock — the numbers committed
  * to BASELINE.md next to the RLdata500 head-to-head.
  *
  * Run: sbt "Test/runMain graft.er.RLdata10000Parity [samples]" —
  * `samples` (default 30, i.e. 300 sweeps at thin 10) overrides the
  * conf's sampleSize; pass 100 for the conf's canonical 1000 sweeps
  * (~4 min since the round-11 collapsed-scan memoization — 0.236
  * s/sweep, see BASELINE.md).
  */
object RLdata10000Parity {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(30)
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val refConf = Files.readString(
      Paths.get("/root/reference/examples/RLdata10000.conf"))
      .replace("./examples/RLdata10000.csv",
        "/root/reference/examples/RLdata10000.csv")
      .replace("./examples/RLdata10000_results/", "/tmp/rl10k_ref_out")
      .replace("sampleSize : 100", s"sampleSize : $samples")
    Files.writeString(Paths.get("/tmp/rl10k_ref.conf"), refConf)
    val t0 = System.nanoTime()
    ERProject.run(spark, ERProject.loadConf("/tmp/rl10k_ref.conf"))
    val dt = (System.nanoTime() - t0) / 1e9
    val diagHeader = scala.io.Source
      .fromFile("/tmp/rl10k_ref_out/diagnostics.csv").getLines().next()
    val eval = Files.readString(
      Paths.get("/tmp/rl10k_ref_out/evaluation-results.txt"))
    println(s"== reference RLdata10000.conf (HOCON): " +
      s"${dt.round} s for ${samples * 10} sweeps ==")
    println(s"diagnostics schema: $diagHeader")
    println(eval)
    spark.stop()
  }
}
