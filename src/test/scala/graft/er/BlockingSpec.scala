package graft.er

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class BlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRank equals a single-partition row_number over the same order") {
    val df = (1 to 500).map(i => ((i * 7919) % 501, i))
      .toDF("k", "id").repartition(7)
    val ranked = Blocking.globalRank(df, Seq(col("k"), col("id")),
      partitions = 5)
    val got = ranked.select("k", "id", "rank").as[(Int, Int, Long)]
      .collect().sortBy(_._3)
    val expected = df.as[(Int, Int)].collect()
      .sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((k, id), i) => (k, id, i + 1L) }
    assert(got.toSeq == expected.toSeq)
  }

  test("sorted-neighborhood pairs = all |rank diff| <= w pairs, exactly once") {
    val df = Seq("delta", "alpha", "echo", "bravo", "charlie", "foxtrot",
      "golf", "hotel").zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("id", "k")
    val pairs = Blocking.sortedNeighborhoodPairs(df, "id", "k", w = 2)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    // sorted order: alpha(1) bravo(3) charlie(4) delta(0) echo(2)
    //               foxtrot(5) golf(6) hotel(7)
    val order = Seq(1, 3, 4, 0, 2, 5, 6, 7)
    val expected = (for {
      i <- order.indices; j <- (i + 1) until math.min(i + 3, order.size)
    } yield (order(i), order(j))).toSet
    assert(pairs == expected)
  }

  test("blocking quality: exact reduction ratio and completeness") {
    // 6 records, 2 blocks of 3 -> cand = 2*3 = 6 of 15 total pairs;
    // truth = {(1,2) same block, (3,4) cross block} -> completeness 0.5
    val corpus = Seq((1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y"),
      (6, "y")).toDF("id", "blk")
    val truth = Seq((1, 2), (3, 4)).toDF("a", "b")
    val m = Blocking.quality(corpus, "id", col("blk"), truth, "s").head()
    assert(m.getAs[Long]("total_pairs") == 15L)
    assert(m.getAs[Long]("cand_pairs") == 6L)
    assert(m.getAs[Long]("reduction_ratio_e6") == 600000L)
    assert(m.getAs[Long]("true_pairs") == 2L)
    assert(m.getAs[Long]("found_true") == 1L)
    assert(m.getAs[Long]("completeness_e6") == 500000L)
  }
}
