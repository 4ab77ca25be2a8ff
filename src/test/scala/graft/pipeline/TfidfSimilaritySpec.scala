package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class TfidfSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("near-identical docs rank first; disjoint vocabulary never matches") {
    val docs = Seq(
      (1L, "spark shuffle join broadcast"),
      (2L, "spark shuffle join broadcast extra"),   // near-dup of 1
      (3L, "spark scan filter"),                    // shares 'spark' only
      (4L, "totally different words entirely"),     // idf-zero overlap
      (5L, "shuffle shuffle shuffle join")          // tf-weighted overlap
    ).toDF("id", "text")
    val out = Search.tfidfCosineTopK(docs, docs.filter(col("id") === 1),
        "id", "text", k = 4)
      .select("rank", "cid").as[(Int, Long)].collect().toMap
    assert(out(1) == 2L, s"nearest must be the near-duplicate: $out")
    // doc 4 shares no terms → absent from the candidate set entirely
    assert(!out.values.toSet.contains(4L),
      s"disjoint doc must not appear: $out")
  }

  test("cosine against a hand-computed two-doc model") {
    // corpus of 4 docs; idf(t) = ln(4/df)
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d d")
    ).toDF("id", "text")
    val out = Search.tfidfCosineTopK(docs, docs.filter(col("id") === 1),
        "id", "text", k = 3)
      .select("cid", "cosine").as[(Long, Double)].collect().toMap
    val ia = math.log(4.0 / 3); val ib = math.log(4.0 / 2)
    // w(1) = (a: ia, b: ib); w(2) identical → cosine 1
    assert(out(2L) == 1.0)
    // w(3) = (a: ia, c: ln 4); cos = ia² / (|1||3|)
    val n1 = math.sqrt(ia * ia + ib * ib)
    val n3 = math.sqrt(ia * ia + math.log(4.0) * math.log(4.0))
    val expected = math.rint(ia * ia / (n1 * n3) * 1e6) / 1e6
    assert(math.abs(out(3L) - expected) < 1e-9, s"got ${out(3L)}, want $expected")
    assert(!out.contains(4L))
  }
}
