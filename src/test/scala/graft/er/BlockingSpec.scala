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

  test("symspellPairs == brute-force Levenshtein<=1 on adversarial strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // covers substitution, insertion, deletion, transposition (dist 2 —
    // must be REJECTED by the verify even though del-keys collide),
    // duplicate-adjacent chars, and unrelated values
    val vals = Seq("cat", "cut", "cart", "at", "ct", "act", "tac",
      "aab", "ab", "ba", "dog", "dogs", "odg", "xyz")
    val want = (for {
      i <- vals.indices; j <- (i + 1) until vals.size
      a = vals(i); b = vals(j)
      if lev(a, b) <= 1
    } yield {
      val (x, y) = if (a < b) (a, b) else (b, a)
      (x, y, lev(a, b).toLong)
    }).toSet
    val got = Blocking.symspellPairs(vals.toDF("w"), "w")
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
    // spot-check the trap: "ab" vs "ba" share deletion keys but lev=2
    assert(!got.exists { case (a, b, _) => a == "ab" && b == "ba" })
    assert(got.contains(("aab", "ab", 1L)))
  }
}
