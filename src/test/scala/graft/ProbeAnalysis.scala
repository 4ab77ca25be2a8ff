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

  /** MinHash band census: for every TRUE near-dup pair (the gate's own
    * LSH+verify output, which the DuckDB oracle proves equals the
    * all-pairs answer), the MINIMUM band index whose band hash matches.
    * A bands=b config uses exactly the band prefix 0..b-1 of the same
    * 4-row slices, so max(min_band) is the smallest complete band count
    * per SF. Run:
    *   sbt "Test/runMain graft.ProbeAnalysis minhash <sfDir>..."
    */
  def minhashCensus(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionAll(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(10))).as("text")))
    val truePairs = graft.pipeline.Dedup.nearDuplicatePairs(
        planted, "doc_id", "text", threshold = 0.8,
        shingleSize = 3, bands = 32, rowsPerBand = 4)
      .select(col("a"), col("b"))
    val bands = graft.pipeline.Dedup.lshBands(planted, "doc_id", "text",
      shingleSize = 3, bands = 32, rowsPerBand = 4)
    val minBand = truePairs
      .join(bands.toDF("a", "band", "ha"), "a")
      .join(bands.toDF("b", "band", "hb"), Seq("b", "band"))
      .filter(col("ha") === col("hb"))
      .groupBy("a", "b")
      .agg(min(col("band")).as("min_band"), count(lit(1)).as("n_bands"))
    val stats = minBand.agg(
      count(lit(1)).as("caught"),
      max(col("min_band")).as("max_min_band"),
      min(col("n_bands")).as("min_band_hits")).head()
    println(s"[minhash] $dir truePairs=${truePairs.count()} " +
      s"caught=${stats.getLong(0)} maxMinBand=${stats.getAs[Any](1)} " +
      s"minBandHits=${stats.getAs[Any](2)}")
    minBand.orderBy(col("min_band").desc).limit(5).collect().foreach(r =>
      println(s"[minhash]   worst a=${r.get(0)} b=${r.get(1)} " +
        s"minBand=${r.get(2)} hits=${r.get(3)}"))
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("minhash")) {
      args.drop(1).foreach(d => minhashCensus(spark, d))
      spark.stop()
      return
    }
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
