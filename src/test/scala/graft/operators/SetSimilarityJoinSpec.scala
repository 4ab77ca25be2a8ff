package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SetSimilarityJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic corpus: token draws from a 40-word vocab, doc
    * lengths 3..18, plus planted near-duplicate pairs. */
  private def corpus(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until n).map { id =>
      val len = 3 + rnd.nextInt(16)
      (id.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    // plant near-dups: doc n+i = doc i with one token appended
    val dups = (0 until n / 4).map { i =>
      ((n + i).toLong, base(i)._2 + " w0")
    }
    (base ++ dups).toDF("id", "text")
  }

  for (t <- Seq(0.5, 0.7, 0.9))
  test(s"prefix-filtered join equals brute force at t=$t") {
    val docs = corpus(80, seed = 42)
    val fast = SetSimilarityJoin.jaccardSelfJoin(docs, "id", "text", t)
      .select("a", "b", "inter", "n_a", "n_b")
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    val brute = SetSimilarityJoin.jaccardBruteForce(docs, "id", "text", t)
      .select("a", "b", "inter", "n_a", "n_b")
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(fast == brute,
      s"prefix filter must be lossless: missing=${brute -- fast} " +
        s"extra=${fast -- brute}")
    assert(brute.nonEmpty, "fixture must produce matching pairs")
  }

  test("identical docs pair at jaccard 1.0; disjoint docs never pair") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("id", "text")
    val out = SetSimilarityJoin.jaccardSelfJoin(docs, "id", "text", 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("token order and duplicate tokens do not affect the set semantics") {
    val docs = Seq((1L, "b a a b c"), (2L, "c  b a")).toDF("id", "text")
    val out = SetSimilarityJoin.jaccardSelfJoin(docs, "id", "text", 0.99)
      .collect()
    assert(out.length == 1 && out.head.getAs[Double]("jaccard") == 1.0)
  }
}
