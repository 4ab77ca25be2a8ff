package graft.streaming

// Scratch probe: what does an AvailableNow drain of a LEFT OUTER
// stream-stream join actually emit? (null rows require the watermark to
// pass; a single-batch drain may withhold them unless a closing batch
// advances it.)  sbt "Test/runMain graft.streaming.OuterJoinProbe"
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val dir = {
      // single-file layout like the gate runners expect
      val base = java.nio.file.Files.createTempDirectory("ojprobe").toFile
      val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      val stage = new java.io.File(base, "stage")
      src.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val d = new java.io.File(base, "data"); d.mkdirs()
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(d, "events.parquet").toPath)
      d.getAbsolutePath
    }
    val q = EventStreams.runStreamStreamLeftJoinOnce(spark, dir, "oj_probe")
    graft.queries.StreamingQueries.drained(q, timeoutMs = 180000)
    val out = spark.table("oj_probe")
    val total = out.count()
    val nulls = out.filter(col("click_id").isNull).count()
    // batch equivalents
    val ev = graft.Tables.load(spark, dir, "events")
    val batch = EventStreams.viewClickPairsLeftOuter(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
    val btotal = batch.count()
    val bnulls = batch.filter(col("click_id").isNull).count()
    val maxTs = ev.agg(max(unix_micros(
      graft.Tables.normalizeEventTime(ev, "ts")("ts")))).head.getLong(0)
    println(s"STREAM total=$total nulls=$nulls  BATCH total=$btotal nulls=$bnulls maxTsUs=$maxTs")
    spark.stop()
  }
}
