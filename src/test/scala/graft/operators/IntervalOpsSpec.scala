package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force references over small long-valued interval sets. */
  private def bruteMax(iv: Seq[(Long, Long)]): Long = {
    val pts = iv.flatMap { case (s, e) => Seq(s, e) }.distinct.sorted
    pts.map(t => iv.count { case (s, e) => s <= t && t < e }).max
  }
  private def bruteCovered(iv: Seq[(Long, Long)]): Long = {
    val pts = iv.flatMap { case (s, e) => Seq(s, e) }.distinct.sorted
    pts.sliding(2).collect { case Seq(a, b)
      if iv.exists { case (s, e) => s <= a && b <= e } => b - a }.sum
  }

  test("hand-built fixture: overlaps, nesting, touching, gaps") {
    // [0,10) [5,15) overlap → 2; [20,30) isolated; [25,26) nested → 2;
    // [30,40) touches 30 (half-open: no triple)
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 30L), (25L, 26L), (30L, 40L))
    val df = iv.map { case (s, e) => ("g", s, e) }.toDF("k", "s", "e")
    val mc = IntervalOps.maxConcurrency(df, "k", "s", "e").collect().head
    assert(mc.getAs[Long]("max_concurrent") == 2L)
    assert(mc.getAs[Long]("n_intervals") == 5L)
    val cov = IntervalOps.coveredTime(df, "k", "s", "e").collect().head
    // covered: [0,15) =15, [20,40) =20 (26..30 still inside [20,30)) → 35
    assert(cov.getAs[Long]("covered") == 35L)
  }

  test("random intervals match brute force per group") {
    val rnd = new java.util.Random(7)
    val data = for {
      g <- Seq("a", "b", "c")
      _ <- 0 until 40
    } yield {
      val s = rnd.nextInt(1000).toLong
      (g, s, s + 1 + rnd.nextInt(120))
    }
    val df = data.toDF("k", "s", "e")
    val mc = IntervalOps.maxConcurrency(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("max_concurrent"))
      .toMap
    val cov = IntervalOps.coveredTime(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("covered")).toMap
    for (g <- Seq("a", "b", "c")) {
      val iv = data.collect { case (`g`, s, e) => (s, e) }
      assert(mc(g) == bruteMax(iv), s"max concurrency mismatch for $g")
      assert(cov(g) == bruteCovered(iv), s"covered time mismatch for $g")
    }
  }

  test("zero-length and duplicate intervals are harmless") {
    val df = Seq(("g", 5L, 5L), ("g", 5L, 5L), ("g", 1L, 9L), ("g", 1L, 9L))
      .toDF("k", "s", "e")
    val mc = IntervalOps.maxConcurrency(df, "k", "s", "e").collect().head
    assert(mc.getAs[Long]("max_concurrent") == 2L)
    val cov = IntervalOps.coveredTime(df, "k", "s", "e").collect().head
    assert(cov.getAs[Long]("covered") == 8L)
  }
}
