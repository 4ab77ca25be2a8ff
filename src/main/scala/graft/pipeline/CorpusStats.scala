package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation statistics for training-data pipelines:
  * exact substring-span dedup (the shared-n-gram detector popularized by
  * "Deduplicating Training Data Makes Language Models Better", Lee et al.
  * 2022 — re-expressed as a distributed gram-posting join rather than a
  * single-node suffix array), boilerplate line removal (CCNet/RefinedWeb
  * style: a line that appears in a large fraction of documents is
  * template chrome, not content), TF-IDF term scoring, and corpus
  * vocabulary coverage.
  *
  * Scale notes (100 TB): every operator here is one hash-aggregate over
  * an exploded token/line/gram view plus at most one join back — all
  * shuffle keys are either short strings or 8-byte hashes (`hashFn`),
  * all aggregates are partial-aggregation-friendly (map-side combine
  * shrinks the exploded view back to vocabulary/line-df size before the
  * shuffle). Posting lists are df-capped so a pathological gram shared
  * by millions of documents cannot produce a quadratic pair explosion.
  */
object CorpusStats {

  /** Lowercased whitespace tokens (same tokenizer as [[Dedup.tokens]]). */
  private def toks(textCol: Column): Column = Dedup.tokens(textCol)

  /** Document pairs sharing at least one exact run of `spanTokens`
    * consecutive tokens, with the number of distinct shared spans.
    *
    * Dataflow: per document, the distinct set of `spanTokens`-grams
    * (overlapping windows — a doc of T tokens has T-spanTokens+1 grams);
    * explode to (gram, doc) postings; group by gram; emit intra-posting
    * pairs. Postings larger than `maxPostings` are dropped — an
    * extremely common span is boilerplate, not duplication, and would
    * otherwise cost O(df²) pairs (the same guard the decontamination
    * pass uses). Output: (a, b, n_shared_spans), a < b.
    *
    * `hashGrams=true` shuffles 8-byte gram hashes (xxhash64 of the
    * 8-token hash window) instead of the gram strings — the shape to use
    * at scale. A 64-bit collision can in principle land two unrelated
    * docs in one posting (expect ~G²/2⁶⁵ collisions over G total grams
    * — irrelevant below ~10⁹ docs); use the string path when pairs must
    * be exact rather than near-certain.
    *
    * The token/hash array is projected to a column BEFORE the per-gram
    * lambda slices it: Spark does not eliminate common subexpressions
    * inside higher-order-function lambdas, so slicing the `split(...)`
    * expression directly would re-split the whole document once per gram
    * — O(tokens²) per document.
    */
  def duplicateSpanPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int = 8,
      maxPostings: Int = 64,
      hashGrams: Boolean = false): DataFrame = {
    val postings = spanGramTable(docs, idCol, textCol, spanTokens, hashGrams)
      .groupBy("gram")
      .agg(collect_set("doc").as("__ids"))
      .filter(size(col("__ids")).between(2, maxPostings))

    postings
      .select(explode(col("__ids")).as("a"), col("__ids"))
      .select(col("a"), explode(col("__ids")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared_spans"))
  }

  /** The (doc, gram) table behind span dedup: one row per distinct
    * `spanTokens`-gram per document. Grams are SpanHashes longs when
    * `hashGrams` (the scale path) or the literal token-window strings.
    * This is the persistable corpus asset for incremental ingest —
    * write it once per corpus version ([[writeSpanIndex]]); each new
    * batch then joins against it without re-scanning the corpus. */
  def spanGramTable(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, hashGrams: Boolean = true): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2, got $spanTokens")
    val base = graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"), toks(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= spanTokens)
    // per-doc array_distinct is local (no shuffle) and keeps the
    // (doc, gram) table exactly set-semantied for downstream counting
    val grams = (if (hashGrams) {
      base.select(col("doc"),
          transform(col("__toks"), w => xxhash64(w)).as("__th"))
        .select(col("doc"), array_distinct(
          graft.functions.Sketches.span_hashes(col("__th"), spanTokens))
          .as("__grams"))
    } else {
      // clamped stop makes the expression TOTAL: Catalyst's
      // InferFiltersFromGenerate pushes the gram expression into the
      // scan-side filter where it runs on sub-span docs BEFORE the size
      // guard — an unguarded sequence(1, n-k+1) turns descending there
      // and feeds slice() a zero start. (SpanHashes clamps internally.)
      def stops(arr: Column): Column =
        sequence(lit(1), greatest(size(arr) - (spanTokens - 1), lit(1)))
      base.select(col("doc"), array_distinct(transform(
        stops(col("__toks")),
        i => concat_ws(" ", slice(col("__toks"), i, lit(spanTokens)))))
        .as("__grams"))
      // the unused non-deterministic column blocks predicate pushdown:
      // without it the inferred size(__grams) > 0 filter re-evaluates
      // the whole gram expression at the scan on every row
    }).withColumn("__nd", monotonically_increasing_id())
    grams.select(col("doc"), explode(col("__grams")).as("gram"))
  }

  /** Persist / reload the corpus span index (plain parquet: two columns,
    * engine-portable). */
  /** Aggregate a (doc, gram) table into per-gram posting lists
    * (gram, cids). Stored UNCAPPED in the index; the ingest-time
    * `maxPostings` filter is applied per query so one index serves any
    * cap. */
  def spanPostings(gramTable: DataFrame): DataFrame =
    gramTable.groupBy("gram").agg(collect_list(col("doc")).as("cids"))

  /** The index is persisted as POSTING LISTS, aggregated once here —
    * per-ingest cost then genuinely tracks the new batch (an ingest
    * never re-aggregates or re-shuffles the corpus side). */
  def writeSpanIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, spanTokens: Int = 8): Unit =
    spanPostings(spanGramTable(corpus, idCol, textCol, spanTokens))
      .write.mode("overwrite").parquet(path)

  def readSpanIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)

  /** Incremental substring-span dedup: batch documents sharing at least
    * `minShared` exact `spanTokens`-token runs with corpus documents,
    * given the corpus as a prebuilt posting-list index
    * ([[spanPostings]] / [[readSpanIndex]]). Same df-capped
    * posting-list join as [[duplicateSpanPairs]] and the decontamination
    * pass; the (small) batch gram table equi-joins the postings and
    * explodes the capped lists — per-ingest cost tracks the new batch,
    * never the corpus. Output: (corpus_id, batch_id, n_shared_spans). */
  def crossCorpusSpanPairs(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, spanTokens: Int = 8,
      maxPostings: Int = 64, minShared: Long = 1L,
      hashGrams: Boolean = true): DataFrame = {
    val bg = spanGramTable(batch, idCol, textCol, spanTokens, hashGrams)
      .select(col("doc").as("batch_id"), col("gram"))
    index.filter(size(col("cids")) <= maxPostings)
      .join(bg, Seq("gram"))
      .select(explode(col("cids")).as("corpus_id"), col("batch_id"))
      .groupBy("corpus_id", "batch_id")
      .agg(count(lit(1)).as("n_shared_spans"))
      .filter(col("n_shared_spans") >= minShared)
  }

  /** Per-line document frequency across the corpus: (line, df). Lines
    * are `\n`-split verbatim (no trimming — trailing-whitespace variants
    * are distinct lines); empty lines are excluded. */
  def lineDocFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__doc"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(length(col("line")) > 0)
      .groupBy("line")
      .agg(countDistinct("__doc").as("df"))

  /** Strip boilerplate lines: any line appearing in more than
    * `maxDocFrac` of all documents is dropped; survivors are reassembled
    * in original order. Output: (id, clean_text, n_kept, n_dropped).
    * EVERY input document appears in the output — including documents
    * whose every line is boilerplate or empty (clean_text = "",
    * n_kept = n_dropped = 0 for the all-empty case); dropping them is
    * the caller's policy decision. Empty lines are removed from
    * clean_text unconditionally and are counted in neither n_kept nor
    * n_dropped (they carry no boilerplate signal, only formatting).
    *
    * Two shuffles: the line-df aggregate (map-side combined to distinct
    * lines per partition) and the per-document regroup, plus an
    * id-keyed outer join restoring line-less documents (both sides hash
    * on the id, so it shares the regroup's partitioning). The df table
    * is only as large as the distinct-line universe and joins back by
    * line.
    */
  def stripBoilerplateLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFrac: Double = 0.2): DataFrame = {
    val nDocs = docs.select(countDistinct(col(idCol)).as("__n"))
    val df = lineDocFrequency(docs, idCol, textCol)

    val lines = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(length(col("line")) > 0)

    val flagged = lines
      .join(df, "line")
      .crossJoin(broadcast(nDocs))
      .withColumn("__keep", col("df") <= col("__n") * maxDocFrac)

    val regrouped = flagged
      .groupBy(col("__doc").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("clean_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"))

    // restore documents the empty-line filter removed entirely (docs of
    // only empty lines, or empty text): join back to the full id set
    // with empty/zero fills. NULL-text rows stay dropped (the corpus
    // operators' shared null contract), hence the isNotNull guard.
    docs.filter(col(textCol).isNotNull).select(col(idCol)).distinct()
      .join(regrouped, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Intra-document line dedup: drop repeated lines WITHIN each
    * document (keep the first occurrence, preserve order) — the
    * looping-generation / templated-page cleanup that complements the
    * corpus-level [[stripBoilerplateLines]]. Output: (id, clean_text,
    * n_kept, n_dupes_removed).
    *
    * One shuffle (the per-document regroup); first-occurrence selection
    * is a window over (doc, line) which shares the same hash partition
    * as the regroup, so at scale this is one exchange + two local
    * passes. */
  def dedupLinesWithinDoc(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(length(col("line")) > 0)
    val w = Window.partitionBy(col("__doc"), col("line"))
      .orderBy(col("pos").asc)
    lines
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("__doc").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__rn") === 1,
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("clean_text"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") === 1, 0L).otherwise(1L)).as("n_dupes_removed"))
  }

  /** Split documents into overlapping fixed-token-window chunks — the
    * context-window preparation step before tokenization/packing.
    * Chunk i covers tokens [i·(chunkTokens−overlap),
    * i·(chunkTokens−overlap)+chunkTokens); the last chunk may be short.
    * Output: (id, chunk_id, n_tokens, chunk_text). Pure column algebra
    * (sequence + slice + posexplode) — stateless, fuses into the scan,
    * no shuffle. Tokens are whitespace words, case preserved. */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val step = chunkTokens - overlap
    // project the token array to a column first — a lambda slicing the
    // split(...) expression directly would re-split the text per chunk
    // (no CSE inside higher-order-function lambdas)
    val n = size(col("__t"))
    // integer ceil((n - chunkTokens)/step) + 1, exact through doubles
    // for any document below ~2^50 tokens
    val nChunks = when(n <= chunkTokens, lit(1)).otherwise(
      floor((n - chunkTokens + (step - 1)).cast("double") / step)
        .cast("int") + 1)
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__t"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        i => slice(col("__t"), i * step + 1, lit(chunkTokens))))
        .as(Seq("chunk_id", "__toks")))
      .select(col(idCol), col("chunk_id"),
        size(col("__toks")).as("n_tokens"),
        concat_ws(" ", col("__toks")).as("chunk_text"))
  }

  /** Top-`k` TF-IDF terms per document: (id, rank, term, tfidf) with
    * tfidf = tf · ln(N/df), ranked per document by (score desc, term
    * asc). The per-document window partitions by document id, so the
    * rank never global-sorts the corpus. */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    val tokenized = docs.select(col(idCol).as("__doc"),
      explode(toks(col(textCol))).as("term"))

    val tf = tokenized.groupBy("__doc", "term").agg(count(lit(1)).as("tf"))
    // df from the tf table: one row per (doc, term) already, so a plain
    // count per term IS the document frequency — no second distinct.
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("__n"))

    // rank on the ROUNDED score: equal (tf, df) pairs tie exactly in any
    // engine, and rounding absorbs last-ulp ln() differences so the
    // (score desc, term asc) order is identical cross-engine
    val scored = tf.join(dfT, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("__score",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))

    val w = Window.partitionBy("__doc")
      .orderBy(col("__score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__doc").as(idCol), col("rank"), col("term"),
        col("__score").as("tfidf"))
  }

  /** Corpus vocabulary coverage: the top-`k` tokens by frequency with
    * the running fraction of all token occurrences they cover. The
    * top-k is `orderBy().limit(k)` — Catalyst plans TakeOrderedAndProject
    * (per-partition bounded top-k merged on the driver, NO global sort),
    * so a billion-token vocabulary never lands in one task; the
    * rank/cumulative window then runs over ≤ k rows by construction. */
  def vocabularyCoverage(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    val counts = docs
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

    val total = counts.select(sum("cnt").as("__total"))
    val topk = counts.orderBy(col("cnt").desc, col("token").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    topk
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"),
        round(col("__cum").cast("double") / col("__total"), 6).as("cum_share"))
  }
}
