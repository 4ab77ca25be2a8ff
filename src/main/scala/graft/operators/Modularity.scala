package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman-Girvan modularity of a community assignment — the standard
  * "is this partition better than chance" score behind every community
  * detector (Newman & Girvan 2004; Q = Σ_c [e_c/m − (D_c/2m)²] over
  * communities c, with e_c the intra-community edge count, D_c the
  * community degree sum, m the total edge count).
  *
  * Everything here is INTEGER arithmetic: per community this emits the
  * exact contribution numerator 4·m·e_c − D_c² (the per-community term
  * of Q scaled by the common denominator 4m², which the constant
  * m_edges column lets the caller reconstruct), so the score is
  * hash-exact across engines — no float division ever happens.
  * Multi-edges count with multiplicity (multigraph modularity), which
  * keeps the definition consistent with LabelProp's frequency-weighted
  * votes over the same edge list.
  *
  * Scale shape: one aggregate for degrees (O(|E|) exploded rows, map-
  * side combined to one row per node), two node-keyed joins tagging
  * each edge's endpoint communities, and one final aggregate keyed by
  * community — no step materializes anything bigger than the edge
  * list, no collect.
  */
object Modularity {

  /** Per-community modularity decomposition of undirected `edges`
    * (columns a, b — one row per undirected edge, multi-edges allowed)
    * under `labels` (node, label): label, n_members, deg_sum (D_c),
    * e_intra (e_c), m_edges (m, constant), and score_num =
    * 4·m·e_c − D_c² with Q = Σ score_num / (4m²). */
  def perCommunity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val lab = labels.select(col("node"), col("label"))
    // exact total edge count, attached as a broadcast 1-row frame so
    // the computation stays one lazy plan (no driver round-trip)
    val m = broadcast(e.agg(count(lit(1)).as("m_edges")))
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // LEFT join: labeled degree-0 (isolated) nodes still count in
    // n_members — they contribute 0 to deg_sum/e_intra either way, but
    // an inner join would silently drop them from the member census.
    val nodeStats = lab.join(deg, Seq("node"), "left")
      .na.fill(0L, Seq("deg"))
    val commSize = nodeStats.groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"), sum(col("deg")).as("deg_sum"))
    val intra = e
      .join(lab.select(col("node").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("label").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_intra"))
    commSize
      .join(intra, Seq("label"), "left")
      .na.fill(0L, Seq("e_intra"))
      .crossJoin(m)
      .select(col("label"), col("n_members"), col("deg_sum"),
        col("e_intra"), col("m_edges"),
        (lit(4L) * col("m_edges") * col("e_intra") -
          col("deg_sum") * col("deg_sum")).as("score_num"))
  }
}
