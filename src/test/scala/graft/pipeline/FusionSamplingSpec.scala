package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** rrfFuse (reciprocal-rank fusion) and dsirLogWeights (DSIR importance
  * weights) against hand-rolled references. */
class FusionSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrfFuse matches the hand-computed RRF score") {
    // list 0: ids 1,2,3 at ranks 1,2,3; list 1: ids 3,4 at ranks 1,2
    val l0 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val l1 = Seq((3L, 1), (4L, 2)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(l0, l1), k = 60)
      .as[(Long, Int, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    def r(k: Int) = 1.0 / (60.0 + k)
    assert(got(1L) == ((1, r(1))))
    assert(got(2L) == ((1, r(2))))
    assert(got(4L) == ((1, r(2))))
    // id 3 appears in both lists; fold order is list 0 then list 1
    assert(got(3L)._1 == 2)
    assert(got(3L)._2 == r(3) + r(1))
    assert(got.size == 4)
  }

  test("rrfFuse is bit-stable across repartitionings") {
    val l0 = (1L to 50L).map(i => (i, i.toInt)).toDF("id", "rank")
    val l1 = (1L to 50L).map(i => (i, 51 - i.toInt)).toDF("id", "rank")
    val a = Search.rrfFuse(Seq(l0, l1)).orderBy("id")
      .as[(Long, Int, Double)].collect()
    val b = Search.rrfFuse(Seq(l0.repartition(7), l1.repartition(3)))
      .orderBy("id").as[(Long, Int, Double)].collect()
    assert(a.toSeq == b.toSeq) // == on Double: bitwise-equal sums
  }

  private def md5Bucket(tok: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  test("dsirLogWeights matches the hand-rolled bucket-LM log-ratio") {
    val docs = Seq(
      (1L, "spark join shuffle", true),
      (2L, "join join vector", true),
      (3L, "prose words here", false),
      (4L, "vector prose spark", false),
      (5L, "spark spark join", false))
    val B = 16
    val tokCounts: Seq[(Long, Boolean, Long)] = docs.flatMap {
      case (id, t, tgt) =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(tok => (id, tgt, md5Bucket(tok, B)))
    }
    val ct = tokCounts.filter(_._2).groupBy(_._3).view.mapValues(_.size)
    val cs = tokCounts.filterNot(_._2).groupBy(_._3).view
      .mapValues(_.size)
    val tt = tokCounts.count(_._2).toDouble
    val ts = tokCounts.count(!_._2).toDouble
    def delta(b: Long): Double =
      math.log((ct.getOrElse(b, 0) + 1).toDouble / (tt + B)) -
        math.log((cs.getOrElse(b, 0) + 1).toDouble / (ts + B))
    val want: Map[Long, (Long, Double)] = tokCounts.groupBy(_._1).map {
      case (id, rows) =>
        val perB = rows.groupBy(_._3).view.mapValues(_.size).toSeq
          .sortBy(_._1) // bucket-order fold, matching the engine
        id -> ((rows.size.toLong,
          perB.foldLeft(0.0) { case (a, (b, n)) => a + n * delta(b) }))
    }
    val df = docs.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      .join(docs.map { case (id, _, tgt) => (id, tgt) }
        .toDF("doc_id", "is_t"), "doc_id")
    val got = Sampling.dsirLogWeights(df, "doc_id", "text",
        org.apache.spark.sql.functions.col("is_t"), buckets = B)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
    assert(got.keySet == want.keySet)
    for ((id, (n, w)) <- want) {
      assert(got(id)._1 == n, s"doc $id token count")
      assert(math.abs(got(id)._2 - w) < 1e-12, s"doc $id: ${got(id)._2} vs $w")
    }
    // target docs should skew positive, non-target negative on average
    val tgtMean = docs.filter(_._3).map(d => got(d._1)._2).sum / 2
    val rawMean = docs.filterNot(_._3).map(d => got(d._1)._2).sum / 3
    assert(tgtMean > rawMean)
  }
}
