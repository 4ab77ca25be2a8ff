package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record-linkage scoring — the classical
  * deterministic counterpart to the reference engine's Bayesian model
  * (dblink samples a posterior over links; Fellegi–Sunter 1969 scores
  * each candidate pair with a log-likelihood ratio and thresholds it).
  * Together they cover both ends of the linkage spectrum the reference
  * addresses (cf. reference `GibbsUpdates`/`Project` — capability-level
  * citation only; this is an independent classical implementation).
  *
  *   score(a, b) = Σ_j  agree_j ? log2(m_j / u_j)
  *                     : log2((1 − m_j) / (1 − u_j))
  *
  * m_j (P[agree | match]) is supplied; u_j (P[agree | non-match]) is
  * estimated from the value-frequency marginals: u_j = Σ_v (n_v / n)²,
  * computed as a ratio of EXACT integer power sums (Σ n_v² and n² both
  * < 2^53), so the weights are bit-identical across engines.
  *
  * Scale shape: u estimation is one grouped count per attribute over
  * the record table; candidate generation is a blocked self-join (the
  * block key bounds the quadratic locally, exactly like the engine's
  * other blocking operators); scoring is a projection. No all-pairs step.
  */
object FellegiSunter {

  /** One-row frame of u-probabilities, one column `u_<attr>` each. */
  def uProbabilities(records: DataFrame, attrs: Seq[String]): DataFrame = {
    val per = attrs.map { a =>
      records.groupBy(col(a)).agg(count(lit(1)).as("__c"))
        .agg((sum(col("__c") * col("__c")).cast("double") /
          (sum(col("__c")) * sum(col("__c"))).cast("double")).as(s"u_$a"))
    }
    per.reduce(_.crossJoin(_))
  }

  /** Agreement-pattern counts over the blocked pairs: one row per
    * 0/1-vector of attribute agreements (≤ 2^|attrs| rows however big
    * the data), the sufficient statistic EM needs. */
  def agreementPatterns(records: DataFrame, idCol: String,
      attrs: Seq[String], blockCols: Seq[String]): DataFrame = {
    // attrs are renamed __l_/__r_ before the blockCols equi-join, so an
    // attribute doubling as a block column would break the join (or
    // silently change semantics) — reject it up front
    require(attrs.toSet.intersect(blockCols.toSet).isEmpty,
      s"attrs and blockCols must be disjoint: " +
        s"${attrs.toSet.intersect(blockCols.toSet).mkString(", ")}")
    val cols = (Seq(idCol) ++ blockCols ++ attrs).distinct.map(col)
    val r = records.select(cols: _*)
    val l = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__l_$a"))
      .withColumnRenamed(idCol, "a")
    val rr = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__r_$a"))
      .withColumnRenamed(idCol, "b")
    l.join(rr, blockCols).filter(col("a") < col("b"))
      // null-safe agreement: missing <=> missing counts as agreement and
      // never yields a NULL pattern bit (a plain === would NPE the EM's
      // pattern decode on any null attribute)
      .groupBy(attrs.map(a =>
        (col(s"__l_$a") <=> col(s"__r_$a")).cast("int").as(s"g_$a")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Unsupervised m/u/λ estimation by EM (Winkler 1988) under
    * conditional independence: iterate
    *   γ_g  = λ·Π mⱼ^gⱼ(1−mⱼ)^(1−gⱼ) / (that + (1−λ)·Π uⱼ^…)
    *   λ'   = Σ n_g γ_g / N;  mⱼ' = Σ n_g γ_g gⱼ / Σ n_g γ_g;
    *   uⱼ' = Σ n_g (1−γ_g) gⱼ / Σ n_g (1−γ_g)
    * over the agreement-pattern table. The data is touched ONCE (the
    * pattern aggregation); EM itself runs on ≤ 2^|attrs| counts — on
    * the driver here, trivially, and identically replayable in SQL.
    * Patterns iterate in descending-count then descending-bits order so
    * the floating sums are reproducible.
    */
  def emEstimate(records: DataFrame, idCol: String, attrs: Seq[String],
      blockCols: Seq[String], iterations: Int = 3,
      init: (Double, Double, Double) = (0.1, 0.8, 0.3)): DataFrame = {
    val spark = records.sparkSession
    val k = attrs.size
    require(k <= 20, "pattern table is 2^|attrs|")
    val pat = agreementPatterns(records, idCol, attrs, blockCols)
      .collect()
      .map { row => (attrs.indices.map(i => row.getInt(i)).toArray,
        row.getLong(k)) }
      .sortBy { case (g, n) => (-n, -g.foldLeft(0L)((acc, b) => acc * 2 + b)) }
    val nTotal = pat.map(_._2).sum.toDouble
    var lambda = init._1
    var m = Array.fill(k)(init._2)
    var u = Array.fill(k)(init._3)
    (0 until iterations).foreach { _ =>
      var sumG = 0.0; var sumNotG = 0.0; var sumLam = 0.0
      val mNum = new Array[Double](k); val uNum = new Array[Double](k)
      pat.foreach { case (g, n) =>
        var wm = lambda; var wu = 1.0 - lambda
        var j = 0
        while (j < k) {
          wm *= (if (g(j) == 1) m(j) else 1.0 - m(j))
          wu *= (if (g(j) == 1) u(j) else 1.0 - u(j))
          j += 1
        }
        val gamma = wm / (wm + wu)
        sumLam += n * gamma
        sumG += n * gamma; sumNotG += n * (1.0 - gamma)
        j = 0
        while (j < k) {
          if (g(j) == 1) { mNum(j) += n * gamma; uNum(j) += n * (1.0 - gamma) }
          j += 1
        }
      }
      lambda = sumLam / nTotal
      m = mNum.map(_ / sumG)
      u = uNum.map(_ / sumNotG)
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val names = Seq("lambda") ++ attrs.map(a => s"m_$a") ++
      attrs.map(a => s"u_$a")
    val vals = (Seq(lambda) ++ m ++ u)
      .map(v => math.rint((v + 1e-9) * 1e6) / 1e6)
    spark.createDataFrame(
      java.util.Arrays.asList(Row(vals: _*)),
      StructType(names.map(StructField(_, DoubleType, nullable = false))))
  }

  /** Score all same-block pairs (a < b by id): returns
    * (a, b, n_agree, score) with the log2-likelihood-ratio score. The
    * one-row u frame rides a broadcast; the only shuffle is the block
    * equi-join. */
  def scoreBlockedPairs(records: DataFrame, idCol: String,
      attrs: Seq[String], m: Map[String, Double],
      blockCols: Seq[String]): DataFrame = {
    require(attrs.nonEmpty && attrs.forall(m.contains),
      "every attribute needs an m-probability")
    require(attrs.toSet.intersect(blockCols.toSet).isEmpty,
      s"attrs and blockCols must be disjoint: " +
        s"${attrs.toSet.intersect(blockCols.toSet).mkString(", ")}")
    val u = uProbabilities(records, attrs)
    val cols = (Seq(idCol) ++ blockCols ++ attrs).distinct.map(col)
    val r = records.select(cols: _*)
    val l = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__l_$a"))
      .withColumnRenamed(idCol, "a")
    val rr = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__r_$a"))
      .withColumnRenamed(idCol, "b")
    val joined = l.join(rr, blockCols).filter(col("a") < col("b"))
      .crossJoin(broadcast(u))
    // null-safe, matching agreementPatterns' convention
    val agrees = attrs.map(a =>
      (col(s"__l_$a") <=> col(s"__r_$a")).cast("int").as(s"__ag_$a"))
    val scored = joined.select((Seq(col("a"), col("b")) ++ agrees ++
      attrs.map(a => col(s"u_$a"))): _*)
    val score = attrs.map { a =>
      val mj = lit(m(a))
      when(col(s"__ag_$a") === 1, log2(mj / col(s"u_$a")))
        .otherwise(log2((lit(1.0) - mj) / (lit(1.0) - col(s"u_$a"))))
    }.reduce(_ + _)
    scored.select(col("a"), col("b"),
      attrs.map(a => col(s"__ag_$a")).reduce(_ + _).as("n_agree"),
      score.as("score"))
  }
}
