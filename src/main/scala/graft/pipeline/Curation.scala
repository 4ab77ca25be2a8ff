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
    * The survivor per content group is the min-id row; lang/quality are
    * deterministic functions of the cleaned text, hence identical across
    * a duplicate group.
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
    // lang/quality are deterministic functions of the cleaned text, so
    // they are CONSTANT within a clean_hash group — making them grouping
    // keys (instead of carrying them in a min(struct) buffer) yields the
    // same groups while keeping the aggregation a pure-primitive
    // min(docId) HashAggregate; a struct-min buffer would fall back to
    // SortAggregate.
    graft.Tables.fanOut(docs)
      .select(md5(clean.cast("binary")).as("clean_hash"),
        col(idCol).as("docId"),
        TextAnalysis.detectLanguage(clean).as("lang"),
        TextAnalysis.qualityScore(clean).as("quality"))
      .groupBy(col("clean_hash"), col("lang"), col("quality"))
      .agg(min(col("docId")).as("docId"))
      .filter(col("lang").isin(keepLangs: _*) &&
        col("quality") >= minQuality)
      .select(col("docId"), col("clean_hash"), col("lang"), col("quality"))
  }

  /** Per-group score cutoffs that keep AT LEAST the top `keepFrac`
    * fraction of each group: cutoff = the ⌈keepFrac·n⌉-th largest score
    * (an order statistic, NOT an interpolated quantile — value-based,
    * so it is exact and tie-stable across engines: permuting equal
    * scores never changes the k-th largest VALUE). Ceil, not floor:
    * floor(10·0.25) = 2 keeps 20% < the promised 25%. Rows with
    * score == cutoff all survive, so ties can keep slightly more than
    * the target fraction — the deterministic choice. NaN scores are
    * EXCLUDED before ranking (Spark orders NaN above every number, so
    * one NaN score would otherwise become the cutoff and the keep
    * filter would then drop the whole group); n_total counts the
    * rankable rows. Returns (group, n_total, cutoff). */
  def groupScoreCutoffs(docs: DataFrame, groupCol: String,
      scoreCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac in (0,1], got $keepFrac")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
    docs
      .filter(!isnan(col(scoreCol).cast("double")))
      .withColumn("__rn",
        row_number().over(w.orderBy(col(scoreCol).desc)))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") === ceil(col("__n") * keepFrac).cast("long"))
      .select(col(groupCol), col("__n").as("n_total"),
        col(scoreCol).as("cutoff"))
  }

  /** Calibrated per-group filtering: keep rows whose score reaches their
    * group's [[groupScoreCutoffs]] cutoff — "keep the best keepFrac of
    * every language/domain" without a global threshold that would let a
    * high-quality group crowd out the rest. The cutoff table is
    * group-cardinality-sized and broadcast. */
  def keepTopFraction(docs: DataFrame, groupCol: String, scoreCol: String,
      keepFrac: Double): DataFrame =
    docs.join(
        broadcast(groupScoreCutoffs(docs, groupCol, scoreCol, keepFrac)
          .select(col(groupCol), col("cutoff"))),
        groupCol)
      // NaN scores must not survive: Spark orders NaN ABOVE the cutoff
      .filter(!isnan(col(scoreCol).cast("double")) &&
        col(scoreCol) >= col("cutoff"))

  /** Percentile-rank normalization within each group: append
    * `pct_rank` ∈ [0, 1] — `(rank-1)/(n-1)`, ties sharing a rank — so
    * raw scores from differently-scaled sources become comparable and
    * ONE global threshold ("keep every source's top decile") replaces
    * per-source tuning. Tie-sharing RANK makes the value independent of
    * tie order, hence engine-portable with no rounding policy; the
    * division is the same integer pair in every engine, so the doubles
    * match exactly.
    *
    * One shuffle on the group key (the floor for any per-group
    * ranking). A single source dominating the corpus makes that
    * window's partition hot — for skew-prone corpora prefer the
    * broadcast-cutoff path ([[keepTopFraction]]), which reduces
    * map-side first. NULL scores sort engine-dependently (Spark
    * NULLS FIRST vs DuckDB NULLS LAST) — filter or coalesce them
    * before ranking if the score column is nullable. */
  def percentileNormalize(docs: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.withColumn("pct_rank", percent_rank().over(
      Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))))
  }

  /** Winsorization: clamp `valueCol` into its per-group interpolated
    * [pLo, pHi] percentile band — outlier damping before a score feeds
    * a mixture weight or a training objective. Adds `<value>_w` (the
    * clamped value) plus the `w_lo` / `w_hi` cutoffs.
    *
    * The cutoff table is one exact-percentile aggregation broadcast
    * back over the data, so the data side stays a map-side join at any
    * scale. Exact `percentile` buffers each group's values — fine for
    * bounded groups (per-source scores); at warehouse scale swap in
    * `approx_percentile` or a precomputed cutoff table, same join. */
  def winsorize(docs: DataFrame, keys: Seq[String], valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad band [$pLo, $pHi]")
    val cuts = docs.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($valueCol, $pLo)").as("w_lo"),
        expr(s"percentile($valueCol, $pHi)").as("w_hi"))
    docs.join(broadcast(cuts), keys)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("w_lo")), col("w_hi")))
  }

  /** OpenRefine-style fingerprint-key clustering: two values belong to
    * the same cluster iff their SORTED DISTINCT lowercase token sets
    * are identical — the canonical cheap blocking for reordered /
    * re-punctuated near-identical records ("Smith, John" vs "john
    * smith"). One tokenize pass, one hash-aggregate keyed by the md5 of
    * the canonical key (8-byte-ish shuffle keys, never the raw text);
    * singleton keys are dropped. Output: fp_md5, n_members, min_id,
    * max_id. */
  def fingerprintClusters(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.Tables.fanOut(docs)
      .select(col(idCol).as("__id"),
        md5(array_join(array_sort(array_distinct(
          filter(graft.pipeline.Dedup.tokens(col(textCol)),
            t => length(t) > 0))), " ").cast("binary")).as("fp_md5"))
      .groupBy(col("fp_md5"))
      .agg(count(lit(1)).as("n_members"), min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"))
      .filter(col("n_members") >= 2)
}
