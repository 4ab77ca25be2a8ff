package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by minimum-label
  * propagation — the step that turns near-duplicate PAIRS into
  * duplicate CLUSTERS (one representative per component) in a dedup
  * pipeline.
  *
  * Each iteration is one aggregation shuffle: every node takes the min
  * of its own component label and its neighbors'. Convergence needs
  * O(component diameter) iterations; near-dup clusters are shallow
  * (near-cliques), so a handful suffices. The loop is driver-paced like
  * any iterative algorithm (the MCMC sampler included): one action per
  * iteration to test the fixpoint, intermediate labels persisted and
  * the previous iteration's unpersisted. Throws on non-convergence
  * within `maxIter` rather than returning silently wrong labels.
  */
object ConnectedComponents {

  /** (id, component) for every node in `edges` (columns a, b), where
    * component is the minimum node id reachable. */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // cache the edge list first: the undirected union scans it twice,
    // and upstream edge derivations (e.g. an LSH verify join) are
    // exactly what should not run per scan
    val e = edges.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = e
      .union(e.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // initialize with the first propagation round already applied:
    // comp0 = min(id, neighbors) in one aggregation — node enumeration
    // comes free from the grouping, and plain pair components (the bulk
    // of near-dup graphs) converge on the first loop check
    var labels = und.groupBy(col("a").as("id"))
      .agg(least(col("a"), min(col("b"))).as("comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // min over neighbors' labels, merged with the node's own label
      val viaNeighbors = und
        .join(labels.select(col("id").as("b"), col("comp").as("nb")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nb")).as("nbMin"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbMin"), col("comp"))).as("comp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the count materializes `next`, so the previous generation can be
      // dropped without re-triggering its lineage
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      it += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter iterations")
    und.unpersist()
    e.unpersist()
    labels.select(col("id"), col("comp"))
  }
}
