package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-slope probe for the corpus-curation operators: run each at
  * 1x / 2x / 4x the sf0.1 corpus and print wall times. Copies are made
  * content-DISJOINT (a per-copy marker token interleaved between every
  * word, ids offset per copy) so duplicate density stays constant and
  * the measurement is pure corpus-size scaling, not a pair explosion.
  *
  * sbt "Test/runMain graft.pipeline.CorpusScaleProbe [sfDir]"
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // match the Bench session: the probe times 27 query executions,
      // which thrash the default 100-entry codegen class cache
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def corpusTimes(k: Int): Unit = {
      val docs = (0 until k).map { i =>
        // suffix every WORD with a per-copy marker: token count, gram
        // structure and intra-copy duplicate density are preserved
        // exactly, while gram/shingle content is disjoint across copies
        base.select((col("doc_id") + i * 1000000L).as("doc_id"),
          (if (i == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", s"$$1zq$i")).as("text"),
          col("lang"))
      }.reduce(_ unionAll _).localCheckpoint(true)
      val embs = (0 until k).map { i =>
        emb.select((col("vec_id") + i * 1000000L).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionAll _).localCheckpoint(true)
      val nDocs = docs.count()

      def time(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(f"[scale] k=$k%d docs=$nDocs%7d $name%-22s " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows%d")
      }
      time("span_dedup")(CorpusStats.duplicateSpanPairs(
        docs, "doc_id", "text", hashGrams = true).count())
      time("line_df")(CorpusStats.lineDocFrequency(
        docs, "doc_id", "text").count())
      time("tfidf_top3")(CorpusStats.tfIdfTopTerms(
        docs, "doc_id", "text", 3).count())
      time("vocab_cov")(CorpusStats.vocabularyCoverage(
        docs, "text", 50).count())
      time("minhash_dedup")(Dedup.nearDuplicatePairs(docs, "doc_id",
        "text", threshold = 0.8,
        persistLevel = org.apache.spark.storage.StorageLevel.NONE).count())
      time("quantize_int8")(VectorOps.quantizeInt8Stats(
        embs, "vec_id", "embedding").count())
      time("perplexity")({
        val lm = TextAnalysis.charNgramLm(docs, "doc_id", "text")
        TextAnalysis.perplexityScores(docs, lm, "doc_id", "text").count()
      })
      time("bloom_dedup")({
        // corpus = this scale's docs; batch = a fixed-size slice with
        // half exact dups, half fresh — per-ingest cost must stay flat
        // as the corpus behind the bloom/hash assets grows
        val bloom = Dedup.buildCorpusBloom(docs, "text")
        val hashes = docs.select(md5(col("text").cast("binary")).as("h"))
        val batch = docs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") % 100 === 1)
            .select((col("doc_id") + 60000000L).as("doc_id"),
              concat(col("text"), lit(" zzfresh")).as("text")))
          .limit(5000)
        Dedup.exactDedupWithBloom(hashes, bloom, batch,
          "doc_id", "text").count()
      })
      time("semantic_dedup")(VectorOps.semanticDedup(
        embs, "vec_id", "embedding", minCosine = 0.9, bits = 10,
        probes = 8,
        persistLevel = org.apache.spark.storage.StorageLevel.NONE).count())
      spark.catalog.clearCache()
    }

    Seq(1, 2, 4).foreach(corpusTimes)
    spark.stop()
  }
}
