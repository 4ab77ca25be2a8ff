package graft.er

// Measures the RLdata500/RLdata10000-equivalent sampler throughput for
// BASELINE.md. sbt "Test/runMain graft.er.ERPerfBaseline [big|huge] [pcg]"
// — `pcg` switches to the PCG-I collapsed sampler (the reference's
// conf default), exercising the memoized collapsed scan at scale.
object ERPerfBaseline {
  import graft.core.{ConstantSimilarity, LevenshteinSimilarity}
  import graft.er.model._

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.maxPlanStringLength", "16384")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val firstNames = (0 until 400).map(i => s"NAME${i}X${i % 7}")
    val lastNames = (0 until 150).map(i => s"SURNAME${i}Y")
    def distort(s: String, rng: java.util.SplittableRandom): String =
      s.updated(rng.nextInt(s.length), ('A' + rng.nextInt(26)).toChar)

    def dataset(nEntities: Int): org.apache.spark.sql.DataFrame = {
      val rng = new java.util.SplittableRandom(515151L)
      (0 until nEntities).flatMap { e =>
        val fn = firstNames(rng.nextInt(firstNames.length))
        val ln = lastNames(rng.nextInt(lastNames.length))
        val by = (1940 + rng.nextInt(60)).toString
        val bm = (1 + rng.nextInt(12)).toString
        val bd = (1 + rng.nextInt(28)).toString
        val base = (s"rec-$e-0", e.toString, fn, ln, by, bm, bd)
        if (rng.nextInt(10) == 0) { // 10% duplicates, RLdata difficulty
          val dup = rng.nextInt(5) match {
            case 0 => (s"rec-$e-1", e.toString, distort(fn, rng), ln, by, bm, bd)
            case 1 => (s"rec-$e-1", e.toString, fn, distort(ln, rng), by, bm, bd)
            case 2 => (s"rec-$e-1", e.toString, fn, ln, distort(by, rng), bm, bd)
            case _ => (s"rec-$e-1", e.toString, fn, ln, by, bm, bd)
          }
          Seq(base, dup)
        } else Seq(base)
      }.toDF("rec_id", "ent_id", "fname", "lname", "by", "bm", "bd")
    }

    val prior = BetaParams(0.5, 50.0)
    val specs = Seq(
      AttributeSpec("fname", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("lname", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("by", ConstantSimilarity, prior),
      AttributeSpec("bm", ConstantSimilarity, prior),
      AttributeSpec("bd", ConstantSimilarity, prior))

    val kind =
      if (args.contains("pcg")) GibbsKernel.PCG1 else GibbsKernel.Gibbs
    val workloads =
      if (args.contains("huge")) Seq((910000, 3, 5))     // ~1M records, 32 parts
      else if (args.contains("big")) Seq((91000, 10, 3)) // ~100k records, 8 parts
      else Seq((455, 100, 0), (9090, 30, 1))
    for ((nEnt, sweeps, parts) <- workloads) {
      val df = dataset(nEnt).cache()
      val n = df.count()
      val t0 = System.nanoTime()
      val init = ERState.initialize(spark, df, "rec_id", None, specs,
        idx => if (parts == 0) SinglePartition
               else KDTreePartitioner.fit(idx, Seq(0), parts),
        seed = 319158L, samplerKind = kind)
      val tInit = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var st = init
      val perSweep = (1 to sweeps).map { i =>
        val s0 = System.nanoTime()
        st = st.step()
        if (i % 10 == 0) st = st.checkpointed()
        (System.nanoTime() - s0) / 1e9
      }
      val tSweeps = (System.nanoTime() - t1) / 1e9
      // the first sweep pays one-time costs (codegen, shuffle setup);
      // report the min alongside the mean so run-to-run noise is visible
      println(f"[perf] kind=$kind records=$n partitions=${1 << parts} init=${tInit}%.1fs " +
        f"sweeps=$sweeps total=${tSweeps}%.1fs perSweep=${tSweeps / sweeps}%.3fs " +
        f"minSweep=${perSweep.min}%.3fs " +
        f"each=[${perSweep.map(t => f"$t%.2f").mkString(",")}] " +
        f"obsEnt=${st.summary.numObservedEntities}")
      df.unpersist()
    }
    spark.stop()
  }
}
