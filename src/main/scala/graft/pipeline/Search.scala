package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance scoring over a document corpus — BM25, the standard
  * lexical ranking function (Robertson/Sparck Jones; the Lucene
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf variant):
  *
  *   score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * Execution shape: query terms are filtered INSIDE the token array
  * (row-local higher-order `filter` before the explode), so the explode
  * emits only matching occurrences — at corpus scale the shuffle
  * carries O(matches), not O(tokens). Corpus stats (N, avgdl) are one
  * 1-row aggregate kept in-plan via broadcast cross join; per-term
  * document frequencies are a |terms|-row broadcast. One full corpus
  * pass total.
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
    val toks = docs.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).as("dl"))

    // N and avgdl in one pass over the doc-length projection
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    // only query-term occurrences leave the row: HOF filter, then explode
    val qt = typedLit(terms)
    val tf = toks
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => array_contains(qt, t))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    tf.join(broadcast(df), "term")
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
