package graft.operators

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Measures the candidate-stage cost the 100 TB story rests on:
  *
  *   sbt "Test/runMain graft.operators.SetSimilarityProbe [sfDir]"
  *
  * Two corpora:
  *  1. the real documents table (adversarial for prefix filtering — a
  *     ~30-word vocabulary means almost every document shares tokens);
  *  2. a planted TEMPLATE corpus — hundreds of records sharing one
  *     rare-ish boilerplate token that lands in every probe prefix —
  *     the exact worst case the VERDICT flagged: a plain prefix join
  *     enumerates |posting|² pairs from that one token.
  *
  * Per threshold it prints brute pairs, PLAIN-prefix candidates (the
  * pre-PPJoin join), PPJoin candidates (index-prefix + positional
  * prunes — what jaccardSelfJoin now runs), surviving matches, and the
  * worst probe-posting / index-posting sizes: the index posting is the
  * bound on the per-token join fan-out.
  */
object SetSimilarityProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val real = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    // template corpus — the VERDICT's worst case: records with 8
    // SHARED template tokens + only 2 unique ones. Probe-prefix length
    // at t=0.8 is 3, so after the two unique (df=1) tokens the
    // lexicographically-smallest template token (df=400) lands in
    // EVERY record's probe prefix → one 400-deep posting → the plain
    // prefix join enumerates ~80k pairs from that single token, none
    // of which match (J between noise records = 8/12 ≈ 0.67 < 0.8).
    // The PPJoin index prefix (length 2) EXCLUDES that token on the
    // smaller side, so the hot posting's join fan-out drops to zero.
    // 25 planted near-dup pairs (J = 9/11 ≈ 0.818) must still be found.
    def fillers(prefix: String, k: Int): String =
      (0 until k).map(j => s"concat('$prefix', id, '_$j')")
        .mkString("concat_ws(' ', ", ", ", ")")
    val shared8 = "'t0 t1 t2 t3 t4 t5 t6 t7 '"
    val template = spark.range(0, 400).selectExpr("id",
        s"concat($shared8, ${fillers("u", 2)}) AS text")
      .unionAll(spark.range(0, 25).selectExpr("id + 10000 AS id",
        s"concat('zq ', ${fillers("g", 9)}) AS text"))
      .unionAll(spark.range(0, 25).selectExpr("id + 20000 AS id",
        s"concat('zq ', ${fillers("g", 8)}, ' ', concat('h', id)) AS text"))

    for ((label, docs) <- Seq(("documents", real), ("template", template));
         t <- Seq(0.8, 0.9)) {
      val n = docs.count()
      val brute = n * (n - 1) / 2
      val sorted = SetSimilarityJoin.sortedTokens(docs, "id", "text")
      val posting = sorted.select(col("__id"), col("__n"),
          posexplode(slice(col("__toks"), lit(1),
            (col("__n") - ceil(col("__n") * t - 1e-6) + 1).cast("int"))))
        .select(col("__id"), col("__n"),
          (col("pos") + 1).as("__pos"), col("col").as("__tok"))
      // plain prefix join (no PPJoin prunes) — the r9 shape
      val plain = posting.as("l").join(posting.as("r"),
          col("l.__tok") === col("r.__tok") &&
            col("l.__id") < col("r.__id") &&
            col("r.__n") * t <= col("l.__n") &&
            col("l.__n") * t <= col("r.__n"))
        .select(col("l.__id"), col("r.__id")).distinct().count()
      val ppjoin = SetSimilarityJoin.candidatePairs(sorted, t).count()
      val matches = SetSimilarityJoin
        .jaccardSelfJoin(docs, "id", "text", t).count()
      val worstProbe = posting.groupBy("__tok").count()
        .agg(max("count")).head().getLong(0)
      val worstIndex = posting
        .filter(col("__pos") <= col("__n") -
          ceil(col("__n") * (2 * t / (1 + t)) - 1e-6) + 1)
        .groupBy("__tok").count()
        .agg(max("count")).head().getLong(0)
      println(f"$label%-9s t=$t%.2f docs=$n brute=$brute " +
        f"plainCand=$plain ppjoinCand=$ppjoin matches=$matches " +
        f"worstProbePosting=$worstProbe worstIndexPosting=$worstIndex")
    }
    spark.stop()
  }
}
