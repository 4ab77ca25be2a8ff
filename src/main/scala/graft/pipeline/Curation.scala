package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pass a training-data
  * pipeline actually runs, built from the individually-oracle-checked
  * stages (TextAnalysis.cleanText / detectLanguage / qualityScore,
  * Dedup-style exact dedup).
  *
  * Shape at scale: cleaning, language id and quality scoring are pure
  * column algebra fused into the scan projection; the only shuffle is
  * the dedup hash aggregation. 100 TB of documents = one scan + one
  * balanced shuffle on content hash.
  */
object Curation {

  /** Clean every document, keep those in `keepLangs` with quality at or
    * above `minQuality`, then drop exact duplicates of the CLEANED text,
    * keeping the lowest id per content. Returns
    * (docId, clean_hash, lang, quality), one row per surviving document.
    *
    * The survivor row is selected atomically via min over a
    * (docId, lang, quality) struct — ids are unique, so this is the
    * min-id row; lang/quality are deterministic functions of the cleaned
    * text, hence identical across a duplicate group anyway. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5): DataFrame = {
    val cleaned = graft.Tables.fanOut(docs)
      .select(col(idCol).as("docId"),
        TextAnalysis.cleanText(col(textCol)).as("clean"))
      .select(col("docId"), col("clean"),
        TextAnalysis.detectLanguage(col("clean")).as("lang"),
        TextAnalysis.qualityScore(col("clean")).as("quality"))
      .filter(col("lang").isin(keepLangs: _*) &&
        col("quality") >= minQuality)
    cleaned
      .select(md5(col("clean").cast("binary")).as("clean_hash"),
        struct(col("docId"), col("lang"), col("quality")).as("row"))
      .groupBy(col("clean_hash"))
      .agg(min(col("row")).as("keep"))
      .select(col("keep.docId").as("docId"), col("clean_hash"),
        col("keep.lang").as("lang"), col("keep.quality").as("quality"))
  }
}
