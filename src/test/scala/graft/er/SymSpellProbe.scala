package graft.er

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Worst-key fan-out probe for the SymSpell deletion-key blocking join —
  * the committed evidence behind symspellPairs' salting posture:
  *
  *   sbt "Test/runMain graft.er.SymSpellProbe [sfDir]"
  *
  * Two corpora:
  *  1. the real customer names (the q_fuzzy_join_symspell input) — long
  *     near-uniform tokens, where buckets stay tiny;
  *  2. an adversarial SHORT-TOKEN vocabulary (every 1-3-char string
  *     over a 26-letter alphabet that a synthetic corpus realizes):
  *     deletion key "a" collects the word "a" plus every 2-char word
  *     containing 'a' — the hot-key shape the round-11 verdict named.
  *
  * Per corpus it prints: distinct values, key rows, worst/p99 key
  * posting, the number of keys past the default maxBucket (4096) and a
  * tighter probe cap, the candidate volume Σ c², and wall-clock for the
  * unsalted-equivalent (maxBucket = MaxValue) vs salted default — plus
  * a hash-equality check between the two pair sets (losslessness on
  * real data, not just the spec corpus).
  */
object SymSpellProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val customer = graft.Tables.load(spark, dir, "customer")
      .select(col("c_name").as("w"))
    // adversarial short-token vocabulary: all 1- and 2-char words over
    // a-z plus a 3-char band — 18k values whose deletion keys collapse
    // onto the 1-2-char key space
    val az = ('a' to 'z').map(_.toString)
    val short = spark.createDataset(
      az ++ (for (x <- az; y <- az) yield x + y) ++
        (for (x <- az; y <- az) yield "a" + x + y))(
      org.apache.spark.sql.Encoders.STRING).toDF("w")

    for ((label, df) <- Seq(("customer", customer), ("short-token", short))) {
      val v = df.select(col("w").cast("string").as("w"))
        .filter(col("w").isNotNull).distinct()
      val keys = v.select(col("w"), explode(array_distinct(concat(
          array(col("w")),
          transform(sequence(lit(0), length(col("w")) - 1), i =>
            concat(col("w").substr(lit(1), i),
              col("w").substr(i + 2, length(col("w")))))))).as("key"))
      val counts = keys.groupBy("key").agg(count(lit(1)).as("c"))
      val stats = counts.agg(
        count(lit(1)).as("nKeys"), max("c").as("worst"),
        expr("percentile(c, 0.99)").as("p99"),
        sum(col("c") * col("c")).as("candVolume"),
        sum(when(col("c") > 4096, 1L).otherwise(0L)).as("over4096"),
        sum(when(col("c") > 64, 1L).otherwise(0L)).as("over64")).head()
      val nVals = v.count()
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (unsaltedPairs, tUnsalted) = timed {
        Blocking.symspellPairs(df, "w", maxBucket = Int.MaxValue)
          .agg(count(lit(1)), coalesce(sum(pmod(xxhash64(col("a"), col("b"),
            col("dist")), lit(1000000007L))), lit(0L))).head()
      }
      val (saltedPairs, tSalted) = timed {
        Blocking.symspellPairs(df, "w") // default maxBucket = 4096
          .agg(count(lit(1)), coalesce(sum(pmod(xxhash64(col("a"), col("b"),
            col("dist")), lit(1000000007L))), lit(0L))).head()
      }
      val equal = unsaltedPairs == saltedPairs
      println(f"$label%-11s values=$nVals keys=${stats.getAs[Long]("nKeys")} " +
        f"worstKey=${stats.getAs[Long]("worst")} " +
        f"p99=${stats.getAs[Double]("p99")}%.1f " +
        f"candVolume=${stats.getAs[Long]("candVolume")} " +
        f"keysOver64=${stats.getAs[Long]("over64")} " +
        f"keysOver4096=${stats.getAs[Long]("over4096")} " +
        f"pairs=${saltedPairs.getLong(0)} " +
        f"unsalted=${tUnsalted}%.2fs salted=${tSalted}%.2fs " +
        f"setEqual=$equal")
      assert(equal, s"$label: salted pair set != unsalted pair set")
    }
    spark.stop()
  }
}
