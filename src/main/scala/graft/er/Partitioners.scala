package graft.er

import graft.er.model._

/** Entity-space partitioning — decides which shuffle partition owns an
  * entity, as a pure function of the entity's attribute values (reference
  * extension point: partitioning/PartitionFunction.scala:24-43).
  *
  * In the Dataset world this is just a column value (`partitionId`): the
  * per-sweep groupByKey shuffles on it, so no custom Spark Partitioner
  * class is needed. Fitting happens once, driver-side, from the dictionary
  * statistics already collected in the ModelIndex.
  */
sealed trait EntityPartitioner extends Serializable {
  def numPartitions: Int
  def partitionOf(entityValues: Array[Int]): Int
}

/** Everything in one partition (reference `numLevels: 0`). */
case object SinglePartition extends EntityPartitioner {
  val numPartitions = 1
  def partitionOf(entityValues: Array[Int]): Int = 0
}

/** KD-tree over the value domain of selected attributes: recursive
  * weight-median splits, `numLevels` deep → 2^numLevels partitions
  * (reference semantics: partitioning/KDTreePartitioner.scala:28-105).
  * Balances partition record mass and co-locates entities that agree on
  * the split attributes, so most record↔entity moves stay shuffle-local.
  */
final class KDTreePartitioner private (
    val numLevels: Int,
    splitAttrs: Array[Int], // attribute id per level
    thresholds: Array[Int]  // node-indexed (heap layout) split ValueIds
  ) extends EntityPartitioner {

  val numPartitions: Int = 1 << numLevels

  def partitionOf(entityValues: Array[Int]): Int = {
    var node = 0 // heap index; children 2n+1 / 2n+2
    var level = 0
    while (level < numLevels) {
      val v = entityValues(splitAttrs(level))
      val goRight = v > thresholds(node)
      node = 2 * node + 1 + (if (goRight) 1 else 0)
      level += 1
    }
    node - (numPartitions - 1) // leaves are the last 2^L heap slots
  }
}

object KDTreePartitioner {

  /** Fit from the per-attribute value frequencies already in the index:
    * at each node, split the (ValueId-ordered) domain where the cumulative
    * observed weight reaches half. Missing values (-1) route left.
    */
  def fit(index: ModelIndex, attrIds: Seq[Int], numLevels: Int): KDTreePartitioner = {
    require(numLevels >= 0)
    require(attrIds.nonEmpty || numLevels == 0, "need split attributes")
    val splitAttrs = Array.tabulate(numLevels)(l => attrIds(l % attrIds.length))
    val numNodes = (1 << numLevels) - 1
    val thresholds = new Array[Int](numNodes)

    // Weighted median split per node over the node's value range. We track
    // each node's [lo, hi] ValueId range per split attribute; ranges only
    // narrow along the path for the *same* attribute.
    def fill(node: Int, level: Int, ranges: Map[Int, (Int, Int)]): Unit = {
      if (level >= numLevels) return
      val a = splitAttrs(level)
      val attr = index.attributes(a)
      val (lo, hi) = ranges.getOrElse(a, (0, attr.domainSize - 1))
      var total = 0L
      var v = lo
      while (v <= hi) { total += attr.counts(v); v += 1 }
      var acc = 0L
      var cut = lo
      v = lo
      while (v <= hi && acc + attr.counts(v) < (total + 1) / 2) {
        acc += attr.counts(v); cut = v + 1; v += 1
      }
      // cut = last ValueId that routes left; ensure both sides non-empty
      val t = math.min(math.max(cut, lo), math.max(hi - 1, lo))
      thresholds(node) = t
      fill(2 * node + 1, level + 1, ranges.updated(a, (lo, t)))
      fill(2 * node + 2, level + 1, ranges.updated(a, (math.min(t + 1, hi), hi)))
    }
    if (numLevels > 0) fill(0, 0, Map.empty)
    new KDTreePartitioner(numLevels, splitAttrs, thresholds)
  }
}
