package graft

import org.apache.spark.sql.functions._

/** Stage decomposition of the q_dedup_incremental pipeline (scratch
  * diagnostic, not a test): times each stage of the 4-stage ingest
  * dedup in isolation (cold cache per stage) so a bench regression can
  * be attributed to a stage instead of guessed at.
  *
  * Run: sbt "Test/runMain graft.IngestDedupProbe"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_RUNS (default 3).
  */
object IngestDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def newDocs = d.filter(col("doc_id") % 30 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 30 === 7)
        .select((col("doc_id") + 300000).as("doc_id"),
          expr("substr(text, 1, greatest(length(text) - 30, 10))").as("text")))
      .unionAll(d.filter(col("doc_id") % 30 === 14)
        .select((col("doc_id") + 400000).as("doc_id"),
          reverse(col("text")).as("text")))
      .unionAll(d.filter(col("doc_id") % 30 === 14)
        .select((col("doc_id") + 450000).as("doc_id"),
          reverse(col("text")).as("text")))

    def time(name: String)(body: => Long): Unit = {
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[stage] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
        spark.catalog.clearCache()
      }
    }

    // stage 1: exact-hash screen (corpus md5 distinct + anti join + window)
    time("exact-screen") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("docId").asc)
      newDocs.select(col("doc_id").as("docId"), col("text"),
          md5(col("text").cast("binary")).as("h"))
        .join(d.select(md5(col("text").cast("binary")).as("h")).distinct(),
          Seq("h"), "left_anti")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .count()
    }
    // stage 2: corpus shingle table (the big text projection)
    time("corpus-shingles") {
      pipeline.Dedup.shingleTable(d, "doc_id", "text", 3).count()
    }
    // stage 3: corpus bands from shingles (128 minhashes/doc)
    time("corpus-bands") {
      pipeline.Dedup.lshBandsFromShingles(
        pipeline.Dedup.shingleTable(d, "doc_id", "text", 3), 32, 4).count()
    }
    // stage 4: the whole pipeline
    time("full-pipeline") {
      pipeline.Dedup.dedupAgainstCorpus(d, newDocs, "doc_id", "text",
        threshold = 0.8, shingleSize = 3, bands = 32, rowsPerBand = 4).count()
    }
    // stage 4b: same, without cache boundaries (recompute over persist)
    time("full-no-persist") {
      pipeline.Dedup.dedupAgainstCorpus(d, newDocs, "doc_id", "text",
        threshold = 0.8, shingleSize = 3, bands = 32, rowsPerBand = 4,
        persistLevel = org.apache.spark.storage.StorageLevel.NONE).count()
    }
    spark.stop()
  }
}
