package graft.er

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.ConstantSimilarity
import graft.er.model._

class PartitionerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def index: ModelIndex = {
    import spark.implicits._
    // skewed domain: value "v00" dominates
    val vals = (0 until 20).flatMap(i => Seq.fill(21 - i)(f"v$i%02d"))
    val idx = AttributeIndex.build(spark, vals.toDF("a"), 0,
      AttributeSpec("a", ConstantSimilarity, BetaParams(1.0, 1.0)))
    new ModelIndex(IndexedSeq(idx), Map("0" -> vals.length.toLong),
      Map((0, "0") -> vals.length.toLong), vals.length.toLong)
  }

  test("single partition maps everything to 0") {
    assert(SinglePartition.numPartitions == 1)
    assert(SinglePartition.partitionOf(Array(5)) == 0)
  }

  test("kd-tree splits balance observed weight") {
    val idx = index
    val part = KDTreePartitioner.fit(idx, Seq(0), numLevels = 2)
    assert(part.numPartitions == 4)
    val attr = idx.attributes(0)
    // weight routed to each partition should be roughly total/4
    val weights = new Array[Long](4)
    (0 until attr.domainSize).foreach { v =>
      val p = part.partitionOf(Array(v))
      assert(p >= 0 && p < 4)
      weights(p) += attr.counts(v)
    }
    val total = attr.counts.sum
    weights.foreach { w =>
      assert(w > total / 10, s"partition too small: ${weights.mkString(",")}")
      assert(w < total / 2, s"partition too large: ${weights.mkString(",")}")
    }
    // missing values route to a valid partition (leftmost path)
    assert(part.partitionOf(Array(MissingValue)) == 0)
  }

  test("kd-tree partition assignment is a pure function of values") {
    val idx = index
    val part = KDTreePartitioner.fit(idx, Seq(0), numLevels = 3)
    (0 until idx.attributes(0).domainSize).foreach { v =>
      assert(part.partitionOf(Array(v)) == part.partitionOf(Array(v)))
    }
  }
}
