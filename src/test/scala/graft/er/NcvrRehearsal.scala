package graft.er

/** NCVR-shaped two-file scale rehearsal (BASELINE.md, r11 ask #4): the
  * paper's North-Carolina-Voter-Registration workload shape — TWO
  * snapshot files of the same voter population, most entities present
  * in both, a fraction of the second-snapshot records distorted (name
  * typo or a changed date field). The fileId axis makes the sampler
  * maintain per-(attribute, file) distortion probabilities at scale
  * (2 files × 5 attributes = 10 θ cells), which the single-file probes
  * never exercised.
  *
  *   sbt "Test/runMain graft.er.NcvrRehearsal [entities] [sweeps]"
  *
  * Defaults: 520,000 entities (≈1M records at 97% per-file presence),
  * 20 sweeps, 16 KD-tree partitions (levels=4) split on fname+lname,
  * the UNCOLLAPSED indexed sampler (the documented scale default —
  * PCG-I is O(records × entities) per sweep and pinned to canonical
  * sizes). Env: SPARK_GRAFT_CPUS (default 16).
  *
  * Prints: init wall, per-sweep times (mean + min), records-per-
  * partition balance (min/max/ratio), per-(attr,file) θ spread, and the
  * pairwise precision/recall/F1 of the FINAL state's clustering vs the
  * planted entity truth — a rehearsal floor (a 20-sweep chain is far
  * from converged; the committed number is a regression floor, not the
  * model's ceiling).
  */
object NcvrRehearsal {
  import graft.core.{ConstantSimilarity, LevenshteinSimilarity}
  import graft.er.model._

  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toInt).getOrElse(520000)
    val sweeps = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.maxPlanStringLength", "16384")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // NCVR-ish attribute pools: given names, surnames, birth date parts
    val firstNames = (0 until 400).map(i => s"NAME${i}X${i % 7}")
    val lastNames = (0 until 150).map(i => s"SURNAME${i}Y")
    def distort(s: String, rng: java.util.SplittableRandom): String =
      s.updated(rng.nextInt(s.length), ('A' + rng.nextInt(26)).toChar)

    // two snapshots: present in A w.p. .97, in B w.p. .97 (at least one
    // guaranteed); 25% of B records carry ONE distorted field — a name
    // typo (40%/30%) or a changed birth-date field (30%) — the
    // snapshot-update error model NCVR linkage papers use
    val rng = new java.util.SplittableRandom(20260815L)
    val rows = (0 until nEnt).flatMap { e =>
      val fn = firstNames(rng.nextInt(firstNames.length))
      val ln = lastNames(rng.nextInt(lastNames.length))
      val by = (1940 + rng.nextInt(60)).toString
      val bm = (1 + rng.nextInt(12)).toString
      val bd = (1 + rng.nextInt(28)).toString
      val inA = rng.nextInt(100) < 97
      val inB = !inA || rng.nextInt(100) < 97
      val a = if (inA)
        Seq((s"A-$e", "A", e.toString, fn, ln, by, bm, bd)) else Seq.empty
      val b = if (inB) {
        val r = if (rng.nextInt(4) == 0) rng.nextInt(10) match {
          case 0 | 1 | 2 | 3 => (s"B-$e", "B", e.toString, distort(fn, rng), ln, by, bm, bd)
          case 4 | 5 | 6     => (s"B-$e", "B", e.toString, fn, distort(ln, rng), by, bm, bd)
          case 7             => (s"B-$e", "B", e.toString, fn, ln, distort(by, rng), bm, bd)
          case 8             => (s"B-$e", "B", e.toString, fn, ln, by, (1 + rng.nextInt(12)).toString, bd)
          case _             => (s"B-$e", "B", e.toString, fn, ln, by, bm, (1 + rng.nextInt(28)).toString)
        } else (s"B-$e", "B", e.toString, fn, ln, by, bm, bd)
        Seq(r)
      } else Seq.empty
      a ++ b
    }
    val df = rows
      .toDF("rec_id", "src", "ent_id", "fname", "lname", "by", "bm", "bd")
      .cache()
    val nRec = df.count()

    val prior = BetaParams(0.5, 50.0)
    val specs = Seq(
      AttributeSpec("fname", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("lname", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("by", ConstantSimilarity, prior),
      AttributeSpec("bm", ConstantSimilarity, prior),
      AttributeSpec("bd", ConstantSimilarity, prior))

    val t0 = System.nanoTime()
    val init = ERState.initialize(spark, df, "rec_id", Some("src"), specs,
      idx => KDTreePartitioner.fit(idx, Seq(0, 1), numLevels = 4),
      seed = 319158L, samplerKind = GibbsKernel.Gibbs)
    val tInit = (System.nanoTime() - t0) / 1e9

    var st = init
    val perSweep = (1 to sweeps).map { i =>
      val s0 = System.nanoTime()
      st = st.step()
      if (i % 10 == 0) st = st.checkpointed()
      (System.nanoTime() - s0) / 1e9
    }

    // partition balance: records per KD partition at the final state
    val balance = st.clusters
      .map(c => (c.partitionId, c.records.length.toLong))
      .toDF("pid", "n").groupBy("pid")
      .agg(org.apache.spark.sql.functions.sum("n").as("records"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val sizes = balance.map(_._2)

    // per-(attr, file) θ spread — the axis this rehearsal exists for
    val thetaByFile = (0 until specs.length).map { a =>
      f"${specs(a).name}:A=${st.theta(a, "A")}%.4f/B=${st.theta(a, "B")}%.4f"
    }

    // quality floor: pairwise P/R/F1 of the final clustering vs truth
    val pred = Analysis.membershipFromClusters(
      st.currentClusters().toDF("cluster"), "cluster")
    val truth = df.select($"rec_id".as("recordId"), $"ent_id".as("clusterId"))
    val m = Analysis.pairwiseMetrics(
      pred.toDF("recordId", "clusterId"), truth, "recordId", "clusterId")
      .head()

    println(f"[ncvr] records=$nRec entities=$nEnt files=2 partitions=16 " +
      f"init=${tInit}%.1fs sweeps=$sweeps " +
      f"perSweep=${perSweep.sum / sweeps}%.2fs minSweep=${perSweep.min}%.2fs")
    println(f"[ncvr] balance records/partition min=${sizes.min} " +
      f"max=${sizes.max} ratio=${sizes.max.toDouble / sizes.min}%.2f " +
      f"all=[${sizes.mkString(",")}]")
    println(s"[ncvr] theta ${thetaByFile.mkString(" ")}")
    println(f"[ncvr] quality precision=${m.getDouble(0)}%.3f " +
      f"recall=${m.getDouble(1)}%.3f f1=${m.getDouble(2)}%.3f " +
      f"obsEnt=${st.summary.numObservedEntities}")
    spark.stop()
  }
}
