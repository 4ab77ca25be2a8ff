package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the iterative-graph centrality
  * companion to [[ConnectedComponents]]' label propagation. Power
  * iteration on the damped transition matrix:
  *
  *   r' = (1 - d) * t  +  d * (M^T r  +  danglingMass * t)
  *
  * where t is the teleport distribution — uniform 1/N for classic
  * PageRank ([[run]]), or concentrated on a seed set for personalized
  * PageRank ([[runPersonalized]], the similar-nodes / recommendation
  * query). Dangling mass (rank held by nodes with no out-edges) returns
  * through t, the standard convention, so sum(r) stays 1 every
  * iteration.
  *
  * Execution shape per iteration — exactly two shuffles, both keyed on
  * node id: (1) ranks join the out-degree-annotated edge list on `src`
  * (the edge side is hash-partitioned ONCE up front and persisted, so
  * only the small rank table moves per round), (2) the contribution
  * aggregation on `dst` with map-side partial sums. The dangling-mass
  * scalar stays in-plan as a one-row broadcast cross join — no
  * per-iteration collect; the only driver-paced work is the loop
  * itself, lineage-truncated per generation via [[LoopCheckpoint]]
  * (eager localCheckpoints by default; reliable-checkpoint cadence
  * under `spark.graft.iterative.checkpoint=reliable` — a growing
  * plan would re-analyze O(iter^2) trees).
  *
  * At warehouse scale edges dominate (|E| >> |V|): partitioning them
  * once and re-using the partitioning every round is the difference
  * between O(iter * |E|) and O(iter * |V|) shuffle bytes.
  */
object PageRank {

  /** (node, rank) for every node appearing in `edges` (columns src,
    * dst), after `iterations` damped power-iteration rounds from the
    * uniform start. Ranks sum to 1. */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85)
      : DataFrame =
    core(edges, None, iterations, damping)

  /** Personalized PageRank: teleport (and the start vector) uniform
    * over `seeds` (column `node`) instead of all nodes — rank
    * concentrates in the seeds' neighborhoods, ranking nodes by
    * proximity to the seed set. Seeds outside the graph are ignored;
    * the seed table is broadcast (seed sets are query-sized). */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame =
    core(edges, Some(seeds), iterations, damping)

  /** Weighted PageRank: edges carry a strictly positive weight column
    * `w`, and a node's rank flows out proportionally to each edge's
    * share of its total out-weight (w / Σ_out w) instead of 1/outdeg.
    * SAME loop as [[run]] (core parameterized over the out-mass
    * aggregate and contribution term — not a clone, so dangling-mass /
    * checkpoint / rounding fixes apply to both automatically); parallel
    * edges act as additive weight. Fails loudly on w <= 0 (a
    * zero-out-weight source with edges would divide rank by zero). */
  def runWeighted(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame =
    core(edges, None, iterations, damping, weighted = true)

  private def core(edges: DataFrame, seeds: Option[DataFrame],
      iterations: Int, damping: Double,
      weighted: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    val spark = edges.sparkSession
    val cp = LoopCheckpoint.forLoop(spark)
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // materialize the edge derivation once; hash-partition by src so the
    // per-iteration ranks-join re-uses this layout instead of
    // re-shuffling the (large) edge side every round
    val eCols =
      if (weighted) Seq(col("src"), col("dst"), col("w").cast("double").as("w"))
      else Seq(col("src"), col("dst"))
    val e = cp.pin(edges.select(eCols: _*)
      .repartition(shufflePartitions, col("src")))

    // ONE materialized node table carrying out-mass (0 = dangling)
    // and the seed flag, derived in a SINGLE aggregation: every edge
    // explodes to a (src, mass) and a (dst, 0) row and out-mass is the
    // sum per node — node enumeration comes free from the grouping, so
    // the old union+distinct / out-degree agg / left-join trio (three
    // exchanges) collapses into one shuffle (r12, guide §2.4). Carrying
    // outm on the rank rows lets the dangling mass fall out of a plain
    // conditional sum over ranks — no per-iteration anti or semi join.
    // Pinned to the node hash layout the loop's left join and the
    // contrib aggregation both use. The loop is driver-latency bound at
    // small |V| (each materialization is a job), so everything that CAN
    // be folded into an existing pass is. The weighted branch also
    // carries the per-source min weight so the stats pass can validate
    // positivity without an extra edge scan.
    val massExpr = if (weighted) col("w") else lit(1L)
    val zeroMass = if (weighted) lit(0.0) else lit(0L)
    val nodes = e.select(explode(array(
        struct(col("src").as("node"), massExpr.as("m"),
          (if (weighted) col("w") else lit(null).cast("double")).as("mw")),
        struct(col("dst").as("node"), zeroMass.as("m"),
          lit(null).cast("double").as("mw")))).as("x"))
      .groupBy(col("x.node").as("node"))
      .agg(sum(col("x.m")).as("outm"), min(col("x.mw")).as("__minw"))
    val meta0 = (seeds match {
      case Some(s) => nodes
        .join(broadcast(s.select(col("node")).distinct()
          .withColumn("__seed", lit(true))), Seq("node"), "left")
        .select(col("node"), col("outm"), col("__minw"),
          coalesce(col("__seed"), lit(false)).as("isSeed"))
      case None => nodes.withColumn("isSeed", lit(true))
    })
    val meta = cp.pin(meta0.repartition(shufflePartitions, col("node")))

    // |V|, dangling presence, |seeds ∩ V| and the weight floor in one
    // pass; a dangling-free graph — common for crawl graphs closed by
    // construction, like the gate's ring graph — drops the dangling
    // term from every iteration
    val stats = meta.agg(count(lit(1)).as("n"),
      count(when(col("outm") === 0, lit(1))).as("nDangling"),
      count(when(col("isSeed"), lit(1))).as("nSeeds"),
      min(col("__minw")).as("minW")).head()
    val n = stats.getLong(0).toDouble
    val hasDangling = stats.getLong(1) > 0L
    val nSeeds = stats.getLong(2).toDouble
    require(n > 0, "PageRank needs a non-empty edge list")
    require(nSeeds > 0,
      "personalized PageRank needs at least one seed present in the graph")
    if (weighted && !stats.isNullAt(3))
      require(stats.getDouble(3) > 0.0,
        s"weighted PageRank needs strictly positive weights; min(w) = " +
          s"${stats.getDouble(3)}")

    // teleport value per node. The uniform case keeps the single
    // driver-computed constant (1-d)/n — bit-compatible with the
    // classic recurrence — rather than (1-d)*(1/n), which rounds
    // differently in IEEE arithmetic.
    val resetTerm: Column = seeds match {
      case None => lit((1.0 - damping) / n)
      case Some(_) => lit(1.0 - damping) *
        when(col("isSeed"), lit(1.0 / nSeeds)).otherwise(lit(0.0))
    }
    val teleport: Column = seeds match {
      case None => lit(1.0 / n)
      case Some(_) =>
        when(col("isSeed"), lit(1.0 / nSeeds)).otherwise(lit(0.0))
    }

    // each edge annotated with its source's fan-out — both sides are
    // already hash-partitioned on the join key, so nothing moves
    val fanout = cp.pin(e.join(meta.select(col("node").as("src"), col("outm")),
      "src"))

    // per-edge share of the source's outgoing rank: the ONLY term that
    // differs between classic and weighted PageRank
    val share: Column =
      if (weighted) col("rank") * col("w") / col("outm")
      else col("rank") / col("outm")

    // start at the teleport distribution: a projection over the
    // checkpointed meta (no job)
    var ranks = meta.select(col("node"), teleport.as("rank"),
      col("outm"), col("isSeed"))

    var roundsSinceCut = 0
    for (_ <- 0 until iterations) {
      // rank mass arriving at each dst: shuffle 1 (ranks to src
      // partitioning) + shuffle 2 (contributions to dst)
      val contrib = fanout
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(share).as("contrib"))
      val base = meta.join(contrib, Seq("node"), "left")
      ranks = (if (!hasDangling) {
        base.select(col("node"),
          (resetTerm +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"),
          col("outm"), col("isSeed"))
      } else {
        // dangling rank this round as a 1-row conditional sum over the
        // rank table itself — in-plan via broadcast cross join, no
        // collect and no join against a dangling-node set
        val dangling = ranks.agg(coalesce(
          sum(when(col("outm") === 0, col("rank"))), lit(0.0))
          .as("danglingMass"))
        base.crossJoin(broadcast(dangling))
          .select(col("node"),
            (resetTerm +
              lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
                col("danglingMass") * teleport)).as("rank"),
            col("outm"), col("isSeed"))
      })
      // materialize every SECOND round, and always under dangling (the
      // 1-row dangling sum is a second consumer of the previous
      // generation, so lazy chaining would duplicate its work): without
      // dangling each round consumes the previous exactly once, and two
      // rounds chain lazily into one materialization job — halving the
      // loop's driver-paced round-trips (the ConnectedComponents
      // pattern, guide §1.2/§2.4). The final round stays lazy: the
      // caller's action (or reliable-mode finish()) materializes it.
      // SINGLE-ACTION CONTRACT (local mode): because the last round can
      // be lazy, a caller that acts on the result MORE than once
      // recomputes it, and the double-sum shuffle order may then yield
      // bit-different last-ulp ranks across actions. Callers needing a
      // stable multi-action frame should cut it themselves
      // (LoopCheckpoint.cut); the gates act exactly once.
      roundsSinceCut += 1
      if (hasDangling || roundsSinceCut == 2) {
        ranks = cp(ranks)
        roundsSinceCut = 0
      }
    }
    cp.finish(ranks.select(col("node"), col("rank")))
  }
}
