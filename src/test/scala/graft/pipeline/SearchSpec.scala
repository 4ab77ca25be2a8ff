package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bm25Ref(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val tokenized = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = tokenized.size.toDouble
    val avgdl = tokenized.map(_._2.size).sum.toDouble / n
    val df = terms.map(t =>
      t -> tokenized.count(_._2.contains(t)).toDouble).toMap
    tokenized.flatMap { case (id, toks) =>
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * toks.size / avgdl))
      }.sum
      if (score > 0) Some(id -> score) else None
    }.toMap
  }

  test("matches the hand-rolled reference on a small corpus") {
    val docs = Seq(
      (1L, "spark shuffle join spark"),
      (2L, "join hash join merge join"),
      (3L, "vector index scan"),
      (4L, "prose with none of the words"),
      (5L, "scan scan scan scan scan scan"))
    val got = Search.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq("join", "scan"))
      .as[(Long, Double)].collect().toMap
    val want = bm25Ref(docs, Seq("join", "scan"))
    assert(got.keySet == want.keySet)
    for ((id, s) <- got)
      assert(math.abs(s - want(id)) < 1e-12, s"doc $id: $s vs ${want(id)}")
    // docs with no query terms produce no row at all
    assert(!got.contains(4L))
    // term saturation: six repeats of 'scan' must not dominate linearly
    assert(got(5L) < 3 * got(3L))
  }

  test("more matching terms outrank higher tf of one term") {
    val docs = Seq(
      (1L, "alpha beta gamma"),   // two distinct query terms
      (2L, "alpha alpha alpha"))  // one term repeated
    val got = Search.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq("alpha", "beta"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
  }
}
