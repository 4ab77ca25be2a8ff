package graft.pipeline

// Scratch probe: stage decomposition of q_binary_ingest at sf0.1 —
// PNG write vs binaryFile read vs decode.
// sbt "Test/runMain graft.pipeline.BinaryIngestProbe"
object BinaryIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm session
    graft.Tables.load(spark, dir, "documents").count()
    for (round <- 1 to 2) {
      val tmp = graft.util.Scratch.dir("png_probe")
      time(s"r$round-write") {
        graft.Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
          .filter(col("doc_id") % 10 === 0)
          .foreachPartition { (ids: Iterator[Long]) =>
            val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(
              graft.util.Scratch.hadoopConf)
            ids.foreach { id =>
              val w = (8 + id % 16).toInt
              val h = (8 + (id / 16) % 8).toInt
              val png = Multimodal.encodePng(Multimodal.grayImage(w, h,
                (x, y) => ((x * 7 + y * 13 + id) % 256).toInt))
              val out = fs.create(
                new org.apache.hadoop.fs.Path(tmp, s"$id.png"), true)
              try out.write(png) finally out.close()
            }
          }
      }
      val media = time(s"r$round-read") {
        val m = spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.png").load(tmp)
          .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("long").as("doc_id"), col("content"))
        m.count(); m
      }
      time(s"r$round-decode") {
        Multimodal.extractImageStats(media.as[(Long, Array[Byte])]
          .map { case (id, b) => Multimodal.MediaRow(id, "image", b, 0, 0) })
          .toDF().count()
      }
    }
    spark.stop()
  }
}
