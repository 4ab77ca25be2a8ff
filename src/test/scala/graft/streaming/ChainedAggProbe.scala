package graft.streaming

// Scratch probe: does an AvailableNow drain flush the SECOND stateful
// aggregation of a chained windowed-agg query, and which daily windows
// does the final watermark close?
// sbt "Test/runMain graft.streaming.ChainedAggProbe"
object ChainedAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val q = EventStreams.runChainedAggOnce(spark,
      "/root/testdata/sf0.001", "ca_probe")
    graft.queries.StreamingQueries.drained(q, timeoutMs = 180000)
    val out = spark.table("ca_probe")
    out.orderBy("day_start", "event_type").show(50, false)
    println(s"rows=${out.count()}")
    val ev = graft.Tables.normalizeEventTime(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "events"), "ts")
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
    println(s"maxTsUs=$maxTs wmUs=${maxTs - 2L * 3600 * 1000000L}")
    // batch replay: hourly counts -> daily rollup, all days
    val hourly = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val daily = hourly.groupBy(window(col("window.start"), "1 day"), col("event_type"))
      .agg(max(col("n")).as("max_hourly"), sum(col("n")).as("sum_n"),
        count(lit(1)).as("n_hours"))
      .select(col("window.start").as("day_start"), col("window.end").as("day_end"),
        col("event_type"), col("max_hourly"), col("sum_n"), col("n_hours"))
    daily.orderBy("day_start", "event_type").show(50, false)
    spark.stop()
  }
}
