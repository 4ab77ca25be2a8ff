package graft.er

import java.nio.file.{Files, Paths}

/** Reference-parity artifact (BASELINE.md §"RLdata500 head-to-head"):
  * run the reference's OWN canonical workload — its shipped
  * examples/RLdata500.csv under its shipped RLdata500.conf semantics
  * (1000 sweeps, thin 10, seed 319158, PCG-I, single partition) —
  * twice:
  *
  *  1. the reference's verbatim HOCON conf through the S6 loader
  *     (only the two filesystem paths are re-pointed: the data path to
  *     the read-only reference checkout, the output to /tmp);
  *  2. the repo's native examples/RLdata500.json (same semantics,
  *     attribute order fname/lname/by/bm/bd instead of by/bm/bd/
  *     fname/lname — a different but equally valid chain).
  *
  * Prints the diagnostics-CSV header (schema parity with the
  * reference's Diagnostics writer), the evaluation results
  * (pairwise precision/recall/F1 + ARI vs the ent_id ground truth),
  * and wall-clock — the numbers committed to BASELINE.md.
  *
  * Run: sbt "Test/runMain graft.er.RLdata500Parity"
  */
object RLdata500Parity {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val csv = "/root/reference/examples/RLdata500.csv"

    def report(label: String, out: String, confPath: String): Unit = {
      val t0 = System.nanoTime()
      ERProject.run(spark, ERProject.loadConf(confPath))
      val dt = (System.nanoTime() - t0) / 1e9
      val diagHeader = scala.io.Source.fromFile(s"$out/diagnostics.csv")
        .getLines().next()
      val eval = Files.readString(Paths.get(s"$out/evaluation-results.txt"))
      println(s"== $label: ${dt.round} s for 1000 sweeps ==")
      println(s"diagnostics schema: $diagHeader")
      println(eval)
    }

    // 1. the reference's own .conf, paths re-pointed
    val refConf = Files.readString(
      Paths.get("/root/reference/examples/RLdata500.conf"))
      .replace("./examples/RLdata500.csv", csv)
      .replace("./examples/RLdata500_results/", "/tmp/rl500_ref_out")
    Files.writeString(Paths.get("/tmp/rl500_ref.conf"), refConf)
    report("reference RLdata500.conf (HOCON, by/bm/bd/fname/lname)",
      "/tmp/rl500_ref_out", "/tmp/rl500_ref.conf")

    // 2. the repo's native JSON config on the same data
    val jsonConf = Files.readString(
      Paths.get("examples/RLdata500.json"))
      .replace("/path/to/RLdata500.csv", csv)
      .replace("/tmp/RLdata500-out", "/tmp/rl500_json_out")
    Files.writeString(Paths.get("/tmp/rl500_json.json"), jsonConf)
    report("repo RLdata500.json (native, fname/lname/by/bm/bd)",
      "/tmp/rl500_json_out", "/tmp/rl500_json.json")

    spark.stop()
  }
}
