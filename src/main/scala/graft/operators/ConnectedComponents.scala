package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by minimum-label
  * propagation — the step that turns near-duplicate PAIRS into
  * duplicate CLUSTERS (one representative per component) in a dedup
  * pipeline.
  *
  * Each propagation round is one aggregation shuffle: every node takes
  * the min of its own component label and its neighbors'. Convergence
  * needs O(component diameter) rounds; near-dup clusters are shallow
  * (near-cliques), so a handful suffices. The loop is driver-paced like
  * any iterative algorithm (the MCMC sampler included), but batches TWO
  * rounds per checkpointed generation — at near-dup graph sizes the
  * loop's floor is driver job latency, not executor work, so halving
  * the round-trips halves the floor. Throws on non-convergence within
  * `maxIter` generations rather than returning silently wrong labels.
  *
  * Lineage discipline: every generation is truncated with an EAGER
  * `localCheckpoint`, exactly like the sampler's sweep loop. A persist
  * alone caches the DATA but leaves the logical plan growing one
  * iteration deeper each round, so Catalyst re-analyzes an O(iter^2)
  * tree that also re-embeds the (large) upstream edge derivation —
  * measured as ~19 s of pure driver time for a 115-node graph at
  * sf0.001, against ~0.4 s of executor work inside the loop. With
  * checkpointed generations the per-iteration plan is constant-size
  * regardless of the upstream pipeline. Superseded generations are
  * reclaimed by the ContextCleaner once the loop drops their
  * references.
  */
object ConnectedComponents {

  /** (id, component) for every node in `edges` (columns a, b), where
    * component is the minimum node id reachable. */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val cp = LoopCheckpoint.forLoop(edges.sparkSession)
    cp.finish(componentsWith(edges, cp, maxIter))
  }

  /** The same loop run inside a CALLER's truncator (an operator that
    * embeds components as a stage — dbscan): every intermediate cut and
    * pin is tracked THERE, so the caller's own finish() reclaims them.
    * The result is deliberately NOT sealed here — it stays lazy over
    * the loop's last cut, and the caller's finish() materializes its
    * final frame before any reclamation. A standalone components() call
    * would otherwise orphan its result cut under the checkpoint dir in
    * reliable mode every time it runs nested (no surviving tracker). */
  private[graft] def componentsWith(edges: DataFrame,
      cp: LoopCheckpoint.Truncator, maxIter: Int = 20): DataFrame = {
    // ONE eager materialization of the edge list: runs the (possibly
    // expensive) upstream derivation — e.g. an LSH candidate+verify
    // pipeline — exactly once, and replaces its logical plan with a
    // LogicalRDD so the loop below re-analyzes a constant-size tree
    val e = cp.pin(edges.select(col("a"), col("b")))
    // the undirected union is two scans of the checkpointed blocks —
    // cheap enough to leave as a view
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    // initialize with the first propagation round already applied:
    // comp0 = min(id, neighbors) in one aggregation — node enumeration
    // comes free from the grouping, and plain pair components (the bulk
    // of near-dup graphs) converge on the first loop check
    var labels = cp(und.groupBy(col("a").as("id"))
      .agg(least(col("a"), min(col("b"))).as("comp")))
    // one min-label propagation round: each node takes the min of its
    // own label and its neighbors' — keeps (prev, comp) so the caller
    // can test the fixpoint of the LAST round applied
    def propagate(lab: DataFrame): DataFrame = {
      val viaNeighbors = und
        .join(lab.select(col("id").as("b"), col("comp").as("nb")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nb")).as("nbMin"))
      lab.select(col("id"), col("comp")).join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbMin"), col("comp"))).as("comp"))
    }
    // Single-action generations (local mode, the KCore pattern): the
    // fixpoint probe rides a long accumulator inside the internal RDD's
    // localCheckpoint+count job (each task bumps it for rows whose prev
    // != comp while copying the row) — one job per generation instead
    // of a cut plus a separate changed-count scan. Reliable mode keeps
    // the Truncator path (durable-cut cadence and lifecycle are the
    // point there).
    val spark = edges.sparkSession
    val singleAction = !LoopCheckpoint.reliableMode(spark)
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // TWO propagation rounds per checkpoint + fixpoint probe: the
      // rounds chain lazily (both aggregation shuffles run in the one
      // checkpoint job), halving the per-iteration driver round-trips
      // and checkpoint materializations — the loop's floor cost at
      // near-dup graph sizes is job latency, not executor work. The
      // fixpoint test compares round 2 against round 1: a round that
      // changes nothing proves convergence regardless of round 1.
      val gen = propagate(propagate(labels))
      val longIds =
        gen.schema("comp").dataType == org.apache.spark.sql.types.LongType &&
        gen.schema("prev").dataType == org.apache.spark.sql.types.LongType
      if (singleAction && longIds) {
        // accumulator fixpoint probe is retry-safe here: a retried task
        // can only over-count rows that genuinely changed (prev == comp
        // rows add 0 on every attempt), so `changed == 0` is exact
        val acc = spark.sparkContext.longAccumulator("ccChanged")
        val base = gen.queryExecution.toRdd
        val iPrev = gen.schema.fieldIndex("prev")
        val iComp = gen.schema.fieldIndex("comp")
        val rdd = base.map { r =>
          if (r.getLong(iPrev) != r.getLong(iComp)) acc.add(1L)
          r.copy()
        }
        rdd.localCheckpoint()
        rdd.count()
        changed = acc.value
        labels = org.apache.spark.sql.GraftExpressionBridge.ofInternalRows(
          spark, rdd, gen.schema)
      } else {
        val next = cp(gen)
        changed = next.filter(col("comp") =!= col("prev")).count()
        labels = next
      }
      it += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter iterations")
    labels.select(col("id"), col("comp"))
  }
}
