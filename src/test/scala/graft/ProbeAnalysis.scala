package graft

import org.apache.spark.sql.functions._

/** Scratch analysis (not a test): for the q_ann_lsh_recall /
  * q_semantic_dedup planted corpora, compute for every TRUE pair
  * (brute-force cosine >= 0.9) the MINIMUM probe seed index whose
  * bits=10 hyperplane bucket catches it. Because a probes=n config uses
  * exactly the seed prefix 0..n-1, the max of that min over all pairs
  * is the smallest probe count that keeps the LSH output equal to the
  * all-pairs answer — per SF, deterministically (fixed data, fixed
  * hyperplanes). Run:
  *   sbt "Test/runMain graft.ProbeAnalysis /root/testdata/sf0.01"
  */
object ProbeAnalysis {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      def plant(offset: Int, d1: Int, d2: Int) =
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + offset).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === d1 || i === d2, lit(0.0f)).otherwise(x))
              .as("embedding"))
      // the q_semantic_dedup corpus is a superset of q_ann_lsh_recall's
      val corpus = emb.unionAll(plant(100000, 7, 39))
        .unionAll(plant(200000, 11, 55))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // true pairs: brute-force all-pairs cosine >= 0.9
      val withNorm = corpus.withColumn("nrm",
        sqrt(aggregate(transform(col("vec"),
          x => x.cast("double") * x.cast("double")),
          lit(0.0d), (acc, v) => acc + v)))
      val t = withNorm.toDF("a", "va", "na")
      val u = withNorm.toDF("b", "vb", "nb")
      val truePairs = t.crossJoin(u).filter(col("a") < col("b"))
        .withColumn("cos",
          aggregate(zip_with(col("va"), col("vb"),
            (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0d), (acc, v) => acc + v) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.9)
        .select(col("a"), col("b"), col("cos"))
      // per-(id, probe) buckets under bits=10, seeds 0..39
      val bits = 10
      val probes = 40
      val sk = corpus.select(col("id"),
        posexplode(array((0 until probes).map(seed =>
          graft.pipeline.VectorOps.hyperplaneSketch(col("vec"), bits, seed)): _*)))
        .toDF("id", "probe", "bucket")
      val minSeed = truePairs
        .join(sk.toDF("a", "pa", "ba"), "a")
        .join(sk.toDF("b", "pb", "bb"), "b")
        .filter(col("pa") === col("pb") && col("ba") === col("bb"))
        .groupBy("a", "b", "cos")
        .agg(min(col("pa")).as("min_seed"), count(lit(1)).as("n_hits"))
      val stats = minSeed.agg(
        count(lit(1)).as("pairs_caught"),
        max(col("min_seed")).as("max_min_seed"),
        expr("percentile(min_seed, 0.99)").as("p99_min_seed"),
        min(col("n_hits")).as("min_probe_hits")).head()
      val nTrue = truePairs.count()
      println(s"[probe] $dir truePairs=$nTrue caught=${stats.getLong(0)} " +
        s"maxMinSeed=${stats.getAs[Any](1)} p99MinSeed=${stats.getAs[Any](2)} " +
        s"minProbeHits=${stats.getAs[Any](3)}")
      val worst = minSeed.orderBy(col("min_seed").desc).limit(8).collect()
      worst.foreach(r => println(s"[probe]   worst pair a=${r.get(0)} " +
        s"b=${r.get(1)} cos=${r.get(2)} minSeed=${r.get(3)} hits=${r.get(4)}"))
    }
    spark.stop()
  }
}
