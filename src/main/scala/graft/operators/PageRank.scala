package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the iterative-graph centrality
  * companion to [[ConnectedComponents]]' label propagation. Power
  * iteration on the damped transition matrix:
  *
  *   r' = (1 - d) / N  +  d * (M^T r  +  danglingMass / N)
  *
  * where dangling mass is the rank held by nodes with no out-edges
  * (redistributed uniformly, the standard convention, so sum(r) stays
  * 1 every iteration).
  *
  * Execution shape per iteration — exactly two shuffles, both keyed on
  * node id: (1) ranks join the out-degree-annotated edge list on `src`
  * (the edge side is hash-partitioned ONCE up front and persisted, so
  * only the small rank table moves per round), (2) the contribution
  * aggregation on `dst` with map-side partial sums. The dangling-mass
  * scalar stays in-plan as a one-row broadcast cross join — no
  * per-iteration collect; the only driver-paced work is the loop
  * itself, lineage-truncated with eager localCheckpoints like the
  * MCMC sweep loop (a growing plan would re-analyze O(iter^2) trees).
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
      : DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    val spark = edges.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // materialize the edge derivation once; hash-partition by src so the
    // per-iteration ranks-join re-uses this layout instead of
    // re-shuffling the (large) edge side every round
    val e = edges.select(col("src"), col("dst"))
      .repartition(shufflePartitions, col("src"))
      .localCheckpoint(true)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count().toDouble

    // out-degree, co-partitioned with the edges (same key, same count)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // each edge annotated with its source's fan-out — this join never
    // moves the edge side (both sides are hash-partitioned on src)
    val fanout = e.join(outdeg, "src").localCheckpoint(true)

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)

    for (_ <- 0 until iterations) {
      // rank mass arriving at each dst: shuffle 1 (ranks to src
      // partitioning) + shuffle 2 (contributions to dst)
      val contrib = fanout
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      // rank held by dangling nodes (no out-edges), as a 1-row frame —
      // broadcast cross join keeps the scalar in-plan, no collect
      val dangling = ranks
        .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("danglingMass"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("danglingMass") / lit(n))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
