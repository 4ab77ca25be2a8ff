package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection): every node
  * simultaneously adopts the most frequent label among its neighbors,
  * ties broken to the SMALLEST label — which makes the per-round
  * update a deterministic function of the previous labeling, so a
  * fixed round count is exactly replayable by an unrolled SQL oracle
  * (asynchronous LPA, the usual formulation, is schedule-dependent and
  * unverifiable).
  *
  * Each round is one join (neighbor labels) + two aggregations (label
  * frequencies, then the argmax via min_by over (−count, label)) on
  * the edge list — O(|E|) per round, labels checkpointed per
  * generation with the ConnectedComponents loop discipline.
  */
object LabelProp {

  /** (node, label) after `rounds` synchronous rounds over the
    * undirected graph `edges` (columns a, b). Labels start as node
    * ids. Isolated nodes never appear (edge-list graphs). */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val cp = LoopCheckpoint.forLoop(edges.sparkSession)
    val e = cp.pin(edges.select(col("a"), col("b")))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    // each round consumes the previous labeling exactly once, so rounds
    // chain lazily: a cut only lands after every second round WITH more
    // rounds still to come (plan depth stays <= 2 loop bodies), the
    // initial labeling inlines into round 1, and the final round stays
    // lazy for the caller's action — for the gate's 2 synchronous
    // rounds the whole propagation is ONE job instead of three
    // driver-paced materializations (r12; the PageRank/CC pattern)
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var sinceCut = 0
    (0 until rounds).foreach { i =>
      labels = und
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("__n")).as("__neg"), col("label"))).as("label"))
      sinceCut += 1
      if (sinceCut == 2 && i < rounds - 1) {
        labels = cp(labels)
        sinceCut = 0
      }
    }
    cp.finish(labels)
  }
}
