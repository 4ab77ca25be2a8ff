package graft.er

// Diagnostic harness (not a test): prints merge/recall trajectories for
// sampler settings. Run: sbt "Test/runMain graft.er.ERTune"
object ERTune {
  import graft.core.{ConstantSimilarity, LevenshteinSimilarity}
  import graft.er.model._

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val firstNames = Vector("ANNA", "BERND", "CARSTEN", "DORIS", "ERWIN",
      "FRIEDA", "GERD", "HELGA", "INGO", "JUTTA", "KLAUS", "LENA", "MARTIN",
      "NADJA", "OTTO", "PETRA", "RAINER", "SABINE", "THOMAS", "UTE")
    val lastNames = Vector("MUELLER", "SCHMIDT", "SCHNEIDER", "FISCHER",
      "WEBER", "MEYER", "WAGNER", "BECKER", "SCHULZ", "HOFFMANN")
    def distort(s: String, rng: java.util.SplittableRandom): String = {
      val i = rng.nextInt(s.length)
      s.updated(i, ('A' + rng.nextInt(26)).toChar)
    }
    // RLdata-shaped: 5 attributes, duplicates distort exactly one
    val rng = new java.util.SplittableRandom(271828L)
    val rows = (0 until 80).flatMap { e =>
      val fn = firstNames(rng.nextInt(firstNames.length))
      val ln = lastNames(rng.nextInt(lastNames.length))
      val by = (1940 + rng.nextInt(60)).toString
      val bm = (1 + rng.nextInt(12)).toString
      val bd = (1 + rng.nextInt(28)).toString
      val base = (s"rec-$e-0", e.toString, fn, ln, by, bm, bd)
      if (rng.nextInt(4) == 0) {
        val dup = rng.nextInt(5) match {
          case 0 => (s"rec-$e-1", e.toString, distort(fn, rng), ln, by, bm, bd)
          case 1 => (s"rec-$e-1", e.toString, fn, distort(ln, rng), by, bm, bd)
          case _ => (s"rec-$e-1", e.toString, fn, ln, by, bm, bd) // exact copy
        }
        Seq(base, dup)
      } else Seq(base)
    }
    println(s"records=${rows.length} dups=${rows.length - 80}")
    val df0 = rows.toDF("rec_id", "ent_id", "fname", "lname", "by", "bm", "bd")

    // "rl10k" mode: RLdata10000-scale quality run (one config, long chain)
    val rl10k = args.contains("rl10k")
    val df = if (!rl10k) df0.cache() else {
      val rng2 = new java.util.SplittableRandom(808080L)
      val fn10k = (0 until 400).map(i => s"NAME$i" + ('A' + i % 26).toChar)
      val ln10k = (0 until 150).map(i => s"SURNAME$i" + ('A' + i % 26).toChar)
      (0 until 9090).flatMap { e =>
        val fn = fn10k(rng2.nextInt(fn10k.length))
        val ln = ln10k(rng2.nextInt(ln10k.length))
        val by = (1940 + rng2.nextInt(60)).toString
        val bm = (1 + rng2.nextInt(12)).toString
        val bd = (1 + rng2.nextInt(28)).toString
        val base = (s"rec-$e-0", e.toString, fn, ln, by, bm, bd)
        if (rng2.nextInt(10) == 0) {
          val dup = rng2.nextInt(5) match {
            case 0 => (s"rec-$e-1", e.toString, distort(fn, rng2), ln, by, bm, bd)
            case 1 => (s"rec-$e-1", e.toString, fn, distort(ln, rng2), by, bm, bd)
            case _ => (s"rec-$e-1", e.toString, fn, ln, by, bm, bd)
          }
          Seq(base, dup)
        } else Seq(base)
      }.toDF("rec_id", "ent_id", "fname", "lname", "by", "bm", "bd").cache()
    }
    val truth = df.select($"rec_id".as("recordId"), $"ent_id".as("clusterId"))
    if (rl10k) {
      val specs = Seq(
        AttributeSpec("fname", LevenshteinSimilarity(7.0, 10.0), BetaParams(0.5, 50.0)),
        AttributeSpec("lname", LevenshteinSimilarity(7.0, 10.0), BetaParams(0.5, 50.0)),
        AttributeSpec("by", ConstantSimilarity, BetaParams(0.5, 50.0)),
        AttributeSpec("bm", ConstantSimilarity, BetaParams(0.5, 50.0)),
        AttributeSpec("bd", ConstantSimilarity, BetaParams(0.5, 50.0)))
      var st = ERState.initialize(spark, df, "rec_id", None, specs,
        idx => KDTreePartitioner.fit(idx, Seq(0), 1), seed = 319158L)
      val block = args.collectFirst {
        case s if s.startsWith("block=") => s.stripPrefix("block=").toInt
      }.getOrElse(if (args.contains("blocked")) 5 else 1)
      println(s"== rl10k records=${df.count()} partitions=2 block=$block")
      val t0 = System.nanoTime()
      (1 to 300 / block).foreach { i0 =>
        val i = i0 * block
        st = st.step(block)
        if (i % 10 == 0) st = st.checkpointed()
        if (i % 50 == 0) {
          val pred = Analysis.membershipFromClusters(
            st.currentClusters().toDF("cluster"), "cluster")
          val m = Analysis.pairwiseMetrics(pred, truth, "recordId", "clusterId").head()
          println(f"  sweep $i%3d ${(System.nanoTime() - t0) / 1e9}%.0fs " +
            f"obsEnt=${st.summary.numObservedEntities} prec=${m.getDouble(0)}%.3f " +
            f"rec=${m.getDouble(1)}%.3f f1=${m.getDouble(2)}%.3f")
        }
      }
      spark.stop()
      return
    }

    for (collapsed <- Seq(true, false); prior <- Seq(BetaParams(0.5, 50.0))) {
      val specs = Seq(
        AttributeSpec("fname", LevenshteinSimilarity(7.0, 10.0), prior),
        AttributeSpec("lname", LevenshteinSimilarity(7.0, 10.0), prior),
        AttributeSpec("by", ConstantSimilarity, prior),
        AttributeSpec("bm", ConstantSimilarity, prior),
        AttributeSpec("bd", ConstantSimilarity, prior))
      var st = ERState.initialize(spark, df, "rec_id", None, specs,
        _ => SinglePartition, seed = 42L,
        samplerKind = if (collapsed) GibbsKernel.PCG1 else GibbsKernel.Gibbs)
      println(s"== collapsed=$collapsed prior=Beta(${prior.alpha},${prior.beta})")
      (1 to 200).foreach { i =>
        st = st.step()
        if (i % 10 == 0) st = st.checkpointed()
        if (i % 25 == 0) {
          val pred = Analysis.membershipFromClusters(
            st.currentClusters().toDF("cluster"), "cluster")
          val m = Analysis.pairwiseMetrics(pred, truth, "recordId", "clusterId").head()
          val th = st.theta.probs.values.toSeq
          println(f"  sweep $i%3d obsEnt=${st.summary.numObservedEntities}%4d " +
            f"prec=${m.getDouble(0)}%.3f rec=${m.getDouble(1)}%.3f " +
            f"theta=[${th.min}%.4f..${th.max}%.4f] logLik=${st.summary.logLikelihood}%.1f")
        }
      }
    }
    spark.stop()
  }
}
