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
    * text, hence identical across a duplicate group anyway.
    *
    * Stage order: dedup FIRST, filter after the aggregate. Because
    * lang/quality are functions of the cleaned text, every member of a
    * clean_hash group passes or fails the filter together, so
    * filter-then-dedup and dedup-then-filter keep exactly the same rows —
    * but the post-agg filter cannot be pushed through the projection,
    * which keeps the whole expensive expression chain (regex cleaning,
    * tokenize, language/quality scoring) in ONE subexpression-eliminated
    * projection instead of being re-inlined into a pre-agg filter. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5): DataFrame = {
    val clean = TextAnalysis.cleanText(col(textCol))
    graft.Tables.fanOut(docs)
      .select(md5(clean.cast("binary")).as("clean_hash"),
        struct(col(idCol).as("docId"),
          TextAnalysis.detectLanguage(clean).as("lang"),
          TextAnalysis.qualityScore(clean).as("quality")).as("row"))
      .groupBy(col("clean_hash"))
      .agg(min(col("row")).as("keep"))
      .filter(col("keep.lang").isin(keepLangs: _*) &&
        col("keep.quality") >= minQuality)
      .select(col("keep.docId").as("docId"), col("clean_hash"),
        col("keep.lang").as("lang"), col("keep.quality").as("quality"))
  }
}
