package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pareto2D vs the brute-force domination definition, tie cases
  * included. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] =
    rows.filterNot { case (_, mx, mn) =>
      rows.exists { case (_, ox, on) =>
        ox >= mx && on <= mn && (ox > mx || on < mn)
      }
    }.toSet

  test("hand case: equal-both ties kept, equal-max dominated dropped") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 10L, 5L),  // frontier
      (2L, 10L, 5L),  // tie with 1 on both dims — kept
      (3L, 10L, 7L),  // same max, worse min — dominated by 1
      (4L, 8L, 3L),   // frontier (cheaper)
      (5L, 8L, 5L),   // dominated by 1 (lower max, equal min)
      (6L, 12L, 9L),  // frontier (best max)
      (7L, 12L, 9L),  // tie with 6 — kept
      (8L, 5L, 3L),   // dominated by 4
      (9L, 4L, 1L))   // frontier (cheapest)
    val got = Skyline.pareto2D(
        rows.toDF("id", "mx", "mn"), "mx", "mn")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(rows))
    assert(got.map(_._1) == Set(1L, 2L, 4L, 6L, 7L, 9L))
  }

  test("multi-partition range scan == domination definition") {
    // Wide max range + explicit partitions=8 forces real range
    // partitions, exercising the cross-partition carry-in (a frontier
    // row in a later partition must see minima from earlier ones).
    val rng = new java.util.SplittableRandom(11L)
    val rows = (1 to 3000).map(i =>
      (i.toLong, rng.nextLong(1000).abs, rng.nextLong(1000).abs))
    val df = rows.toDF("id", "mx", "mn").repartition(13)
    val got = Skyline.pareto2D(df, "mx", "mn", partitions = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(rows))
    // the scan side really fans out (no single-task global sort)
    val nParts = df.repartitionByRange(8,
      org.apache.spark.sql.functions.col("mx").desc).rdd.getNumPartitions
    assert(nParts == 8)
  }

  test("random grids: window scan == domination definition") {
    val rng = new java.util.SplittableRandom(7L)
    for (trial <- 1 to 5) {
      val rows = (1 to 200).map(i =>
        (i.toLong, rng.nextLong(20).abs, rng.nextLong(20).abs))
      val got = Skyline.pareto2D(
          rows.toDF("id", "mx", "mn").repartition(7), "mx", "mn")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == brute(rows), s"trial $trial")
    }
  }
}
