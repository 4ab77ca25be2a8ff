package graft.streaming

// Scratch probe: schema and content of the statestore data source over
// the bounded-dedup checkpoint.
// sbt "Test/runMain graft.streaming.StateReaderProbe"
object StateReaderProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val chk = graft.util.Scratch.dir("srprobe_chk")
    val q = EventStreams.runStreamingDedupBoundedOnce(spark,
      "/root/testdata/sf0.001", "sr_probe", checkpointDir = Some(chk))
    graft.queries.StreamingQueries.drained(q, timeoutMs = 180000)
    val st = spark.read.format("statestore").load(chk)
    st.printSchema()
    st.show(10, false)
    println(s"stateRows=${st.count()}")
    val st0 = spark.read.format("statestore").option("batchId", 0).load(chk)
    st0.show(5, false)
    println(s"state0Rows=${st0.count()} distinct=${spark.read.parquet(
      "/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_type").distinct().count()}")
    spark.stop()
  }
}
