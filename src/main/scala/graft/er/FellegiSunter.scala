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

  /** Score all same-block pairs (a < b by id): returns
    * (a, b, n_agree, score) with the log2-likelihood-ratio score. The
    * one-row u frame rides a broadcast; the only shuffle is the block
    * equi-join. */
  def scoreBlockedPairs(records: DataFrame, idCol: String,
      attrs: Seq[String], m: Map[String, Double],
      blockCols: Seq[String]): DataFrame = {
    require(attrs.nonEmpty && attrs.forall(m.contains),
      "every attribute needs an m-probability")
    val u = uProbabilities(records, attrs)
    val cols = (Seq(idCol) ++ blockCols ++ attrs).distinct.map(col)
    val r = records.select(cols: _*)
    val l = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__l_$a"))
      .withColumnRenamed(idCol, "a")
    val rr = attrs.foldLeft(r)((d, a) => d.withColumnRenamed(a, s"__r_$a"))
      .withColumnRenamed(idCol, "b")
    val joined = l.join(rr, blockCols).filter(col("a") < col("b"))
      .crossJoin(broadcast(u))
    val agrees = attrs.map(a =>
      (col(s"__l_$a") === col(s"__r_$a")).cast("int").as(s"__ag_$a"))
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
