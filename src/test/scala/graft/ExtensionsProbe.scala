package graft

// Probe: verifies graft.GraftExtensions wires lev_sim through
// spark.sql.extensions. sbt "Test/runMain graft.ExtensionsProbe"
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql("SELECT lev_sim('AB', 'BB', 5.0, 10.0) AS s").head().getDouble(0)
    println(s"[ext-probe] lev_sim via extensions = $r (expect 2.0)")
    spark.stop()
  }
}
