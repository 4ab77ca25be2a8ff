package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance scoring over a document corpus — BM25, the standard
  * lexical ranking function (Robertson/Sparck Jones; the Lucene
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf variant):
  *
  *   score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * Execution shape: the corpus is tokenized exactly ONCE — per-term
  * frequencies are counted inside the token array (row-local
  * higher-order filters, no token explode) into a materialized per-doc
  * summary of 2 + |terms| numbers, which then feeds the corpus stats,
  * the document frequencies, and the scoring join. At corpus scale the
  * only full-width pass is that first projection; everything after
  * moves O(docs with a match) summary rows, with stats and df riding
  * as 1-row / |terms|-row broadcasts.
  *
  * Tokenization matches [[TextAnalysis.tokenCount]]: lowercase,
  * whitespace-split — the parity contract the relational oracle
  * replays with `string_split_regex`.
  */
object Search {

  /** (doc_id, score) for every document containing at least one query
    * term. Scores are raw doubles; gates round before ordering. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // ONE tokenization pass: doc length plus an in-row count per query
    // term (row-local HOF filters — no explode, no shuffle of token
    // occurrences), materialized so the stats aggregate, the df
    // aggregate, and the scoring all read the tiny per-doc summary
    // (2 + |terms| numbers per doc) instead of re-tokenizing the corpus
    // per branch
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("toks"), x => x === lit(t))).as(s"__tf$i") }
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .select(col("doc_id") +: size(col("toks")).as("dl") +: tfCols: _*)
      .localCheckpoint(true)

    // N and avgdl, plus per-term document frequency, each one cheap
    // aggregate of the summary
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfAggs = terms.indices.map(i =>
      count(when(col(s"__tf$i") > 0, lit(1))).as(s"__df$i"))
    val dfs = perDoc.agg(dfAggs.head, dfAggs.tail: _*)

    // melt to (doc_id, dl, term index, tf) and score
    val stackArgs = terms.indices
      .map(i => s"$i, CAST(__tf$i AS DOUBLE)").mkString(", ")
    val tf = perDoc
      .selectExpr("doc_id", "dl",
        s"stack(${terms.size}, $stackArgs) AS (ti, tf)")
      .where(col("tf") > 0)
    val dfLong = dfs.selectExpr(
      s"stack(${terms.size}, ${terms.indices
        .map(i => s"$i, __df$i").mkString(", ")}) AS (ti, df)")

    tf.join(broadcast(dfLong), "ti")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl")))).as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
  }

  /** TF-IDF cosine document-similarity search: for each query document,
    * the top-k most similar corpus documents under the sparse TF-IDF
    * vector model — the inverted-index join that powers "more like
    * this" and embedding-free semantic dedup.
    *
    *   w(d, t) = tf(d, t) · ln(N / df(t));  cos = Σ_t w_q·w_d / (‖q‖·‖d‖)
    *
    * Execution shape (the 100 TB story): postings (doc, term, w) are
    * built once — tokenize, in-row term-count via sorted-run fold is
    * avoided here because the downstream join needs term ROWS anyway;
    * document norms are one grouped aggregate over postings; the
    * dot-product join touches only postings of terms the query side
    * contains (query postings broadcast), then one bounded-heap top-k.
    * Nothing is quadratic in documents: the fan-in per query is bounded
    * by Σ_t df(t) over ITS terms — the inverted-index contract.
    *
    * Cosines are rounded to 6 before ranking (ties → smaller corpus
    * id), the engine-parity convention all ANN gates share.
    */
  def tfidfCosineTopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val postings = docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val dfT = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val w = postings.join(dfT, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n_docs") / col("df"))).as("w"))
      .localCheckpoint(true)
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val qIds = queries.select(col(idCol).as("qid"))
    val qw = w.join(broadcast(qIds), col("doc_id") === col("qid"))
      .select(col("qid"), col("term"), col("w").as("qwv"))
    val qNorms = norms.join(broadcast(qIds), col("doc_id") === col("qid"))
      .select(col("qid"), col("norm").as("qnorm"))
    val dots = w.join(broadcast(qw), "term")
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w") * col("qwv")).as("dot"))
    val scored = dots
      .join(norms, "doc_id")
      .join(broadcast(qNorms), "qid")
      .select(col("qid"), col("doc_id").as("cid"),
        round(col("dot") / (col("norm") * col("qnorm")), 6).as("cosine"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.TopK.top_k_by_score(
        col("cosine"), col("cid").cast("long"), k).as("__top"))
      .select(col("qid") +: Seq(posexplode(col("__top"))): _*)
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("cid"), col("col.score").as("cosine"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009): fuse
    * N rankings of the same id space into one list by
    * score(id) = Σ_lists 1 / (k + rank_list(id)), ids absent from a
    * list contributing nothing — the standard hybrid-retrieval combiner
    * (BM25 ∪ embedding ANN) that needs no score calibration because it
    * only consumes RANKS.
    *
    * Each input must carry (id, rank). Determinism: contributions are
    * folded IN LIST ORDER over an in-row sorted (list, rank) array —
    * one aggregation shuffle keyed by id, no float sum whose order
    * depends on partitioning — so the double result is bit-stable and
    * relationally replayable (a per-list pivot join adds the same
    * contributions in the same order). At scale each list is a top-k
    * (bounded); the fuse is one groupBy over ≤ N·k rows. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (df, li) =>
      df.select(col("id"), lit(li).as("__li"),
        col("rank").cast("long").as("__rank"))
    }.reduce(_ unionAll _)
    tagged.groupBy(col("id"))
      .agg(sort_array(collect_list(
        struct(col("__li"), col("__rank")))).as("__rs"))
      .select(col("id"), size(col("__rs")).as("n_lists"),
        aggregate(col("__rs"), lit(0.0d), (acc, s) =>
          acc + lit(1.0) / (lit(k.toDouble) + s("__rank").cast("double")))
          .as("rrf"))
  }
}
