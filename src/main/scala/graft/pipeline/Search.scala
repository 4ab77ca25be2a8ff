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
}
