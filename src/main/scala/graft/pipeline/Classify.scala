package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational text classification — the multinomial naive Bayes
  * baseline every curation pipeline wants before reaching for a model:
  * train a lang/quality/source classifier from labeled documents and
  * score the corpus, entirely as joins and aggregations.
  *
  *   score(d, c) = log P(c) + Σ_t tf(d,t) · log P(t | c)
  *   P(t | c)    = (count(t, c) + 1) / (tokens(c) + |V|)   (Laplace)
  *
  * Scale shape: training is two grouped aggregations over the token
  * postings; the model is |V|·|classes| likelihood rows — a broadcast
  * asset like the LM and IVF tables. Scoring joins postings to the
  * model and folds per (doc, class): the corpus is tokenized once and
  * nothing is quadratic. Scores are rounded to 6 before the argmax so
  * the class ranking is engine-portable (sum-order ulps cannot flip
  * it); ties break to the lexicographically smaller class.
  */
object Classify {

  /** (id, pred, score) per document: the argmax naive-Bayes class. */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val postings = docs
      .select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
        explode(Dedup.tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0)
      .groupBy(col("__id"), col("__lbl"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"))
      .localCheckpoint(true)

    // class priors from document counts; vocabulary size |V| global
    val nDocs = docs.count().toDouble
    val priors = docs.groupBy(col(labelCol).as("__c"))
      .agg((log(count(lit(1)) / nDocs)).as("__logprior"))
    val vocab = postings.select(col("__t")).distinct()
    val vSize = vocab.count().toDouble

    // token counts per class and class token totals
    val classTok = postings.groupBy(col("__lbl").as("__c"), col("__t"))
      .agg(sum(col("__tf")).as("__ct"))
    val classTotals = classTok.groupBy(col("__c"))
      .agg(sum(col("__ct")).as("__tot"))
    // dense |V|×|classes| likelihood table (absent pairs get the
    // Laplace floor) — the broadcastable model
    val model = vocab.crossJoin(classTotals)
      .join(classTok, Seq("__c", "__t"), "left")
      .select(col("__c"), col("__t"),
        log((coalesce(col("__ct"), lit(0.0)) + 1.0) /
          (col("__tot") + vSize)).as("__logp"))

    // score: posting × model join, fold per (doc, class), add prior
    val scores = postings.drop("__lbl")
      .join(broadcast(model), "__t")
      .groupBy(col("__id"), col("__c"))
      .agg(sum(col("__tf") * col("__logp")).as("__ll"))
      .join(broadcast(priors), "__c")
      .select(col("__id"), col("__c"),
        round(col("__ll") + col("__logprior"), 6).as("__score"))
    // argmax with smaller-class tie-break: min_by over (−score, class)
    // — one hash aggregate, no window sort
    scores.groupBy(col("__id"))
      .agg(min_by(struct(col("__c"), col("__score")),
        struct((-col("__score")).as("__neg"), col("__c"))).as("__w"))
      .select(col("__id").as(idCol), col("__w.__c").as("pred"),
        col("__w.__score").as("score"))
  }
}
