package graft.operators

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Measures the prefix filter's candidate reduction on the real
  * documents corpus — the number the 100 TB story rests on:
  *
  *   sbt "Test/runMain graft.operators.SetSimilarityProbe [sfDir]"
  *
  * Prints, per threshold: candidate pairs generated vs brute-force
  * pairs (n·(n−1)/2) vs surviving pairs. This corpus is adversarial
  * for prefix filtering — a ~30-word vocabulary means almost every
  * document shares tokens — so the reduction here is a LOWER bound;
  * realistic corpora (unbounded vocabularies, Zipf tails) give prefix
  * postings far rarer tokens to anchor on.
  */
object SetSimilarityProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.Tables.load(spark, dir, "documents")
    val n = docs.count()
    val brute = n * (n - 1) / 2
    for (t <- Seq(0.8, 0.9, 0.95)) {
      // candidate count: re-run the join WITHOUT the verify filter
      val toks = docs.select(col("doc_id").as("__id"),
          SetSimilarityJoin.tokenSet(col("text")).as("__toks"))
        .filter(size(col("__toks")) > 0)
      val df = toks.select(explode(col("__toks")).as("__tok"))
        .groupBy("__tok").agg(count(lit(1)).as("__df"))
      val sorted = toks.select(col("__id"), explode(col("__toks")).as("__tok"))
        .join(df, "__tok")
        .groupBy("__id")
        .agg(transform(
          sort_array(collect_list(struct(col("__df"), col("__tok")))),
          s => s("__tok")).as("__toks"))
        .withColumn("__n", size(col("__toks")))
      val prefix = sorted.select(col("__id"), col("__n"),
        explode(slice(col("__toks"), lit(1),
          (col("__n") - ceil(col("__n") * t) + 1).cast("int"))).as("__tok"))
      val cand = prefix.as("l").join(prefix.as("r"),
          col("l.__tok") === col("r.__tok") &&
            col("l.__id") < col("r.__id") &&
            col("r.__n") * t <= col("l.__n") &&
            col("l.__n") * t <= col("r.__n"))
        .select(col("l.__id"), col("r.__id")).distinct().count()
      val surviving = SetSimilarityJoin
        .jaccardSelfJoin(docs, "doc_id", "text", t).count()
      println(f"t=$t%.2f  docs=$n  brute=$brute  candidates=$cand " +
        f"(${100.0 * cand / brute}%.1f%% of brute)  matches=$surviving")
    }
    spark.stop()
  }
}
