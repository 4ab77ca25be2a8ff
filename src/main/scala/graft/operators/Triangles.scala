package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and global clustering coefficient over an
  * undirected edge list — the third member of the graph family next to
  * [[ConnectedComponents]] and [[PageRank]].
  *
  * Algorithm: degree-ordered orientation. Each canonical undirected
  * edge {u, v} is directed from the (degree, id)-smaller endpoint to
  * the larger; a triangle {x, y, z} then has exactly ONE vertex with
  * two out-edges inside it, so counting wedges (u→v, u→w) whose
  * closing edge {v, w} exists counts each triangle exactly once.
  *
  * Why orientation matters at scale: the wedge join fans out
  * quadratically in OUT-degree, and degree-ordering bounds every
  * out-degree by O(sqrt(|E|)) — a celebrity node with 10M followers
  * contributes no wedges from its own fan-in, because all its edges
  * point INTO it. Without this, the wedge set of any skewed graph
  * explodes on the hub keys.
  *
  * Three shuffles total: the canonical-edge distinct, the degree
  * aggregation, and the wedge self-join + closing-edge semi join
  * (planned together by Catalyst over the same hash layout).
  */
object Triangles {

  /** One row: n_edges, n_wedges (unordered open+closed paths of length
    * 2, sum over C(deg, 2)), n_triangles, and the global clustering
    * coefficient 3 * triangles / wedges (rounded to 6 places). */
  def globalCount(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession

    // canonical undirected edge set: self-loops dropped, {u,v} stored
    // once as (a, b) with a < b; materialized once — every downstream
    // pass (degrees, wedges, closure probe) re-reads it
    val ce = edges
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)

    val deg = ce.select(col("a").as("v"))
      .union(ce.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

    // orient each edge from the (degree, id)-smaller endpoint
    val oriented = ce
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .localCheckpoint(true)

    // wedges at each pivot u, each unordered {w1, w2} pair once; the
    // closing edge probe is a semi join against the canonical set
    val closed = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        col("e1.w") < col("e2.w"))
      .select(least(col("e1.w"), col("e2.w")).as("a"),
        greatest(col("e1.w"), col("e2.w")).as("b"))
      .join(ce, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))

    val edgeStats = ce.agg(count(lit(1)).as("n_edges"))
    val wedgeStats = deg.agg(
      sum((col("d") * (col("d") - 1) / 2).cast("long")).as("n_wedges"))

    edgeStats.crossJoin(broadcast(wedgeStats))
      .crossJoin(broadcast(closed))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("clustering"))
  }
}
