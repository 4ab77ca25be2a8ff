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

  for (t <- Seq(0.8, 0.9))
  test(s"PPJoin prunes stay lossless on a template-heavy corpus at t=$t") {
    // the adversarial shape for prefix postings: 120 noise records with
    // 8 SHARED template tokens + 2 unique ones, so the smallest shared
    // token lands in EVERY probe prefix (a 120-deep posting) while no
    // noise pair matches (J = 8/12 ≈ 0.67 < 0.8); 15 planted pairs
    // share 9 of 11 union tokens (J ≈ 0.818 — matches at 0.8, not
    // 0.9). The index-prefix + positional prunes must cut the hot
    // posting's fan-out WITHOUT losing a single true pair vs brute.
    def fill(p: String, id: Long, k: Int) =
      (0 until k).map(j => s"$p${id}_$j").mkString(" ")
    val shared8 = "t0 t1 t2 t3 t4 t5 t6 t7"
    val rows =
      (0L until 120L).map(i => (i, s"$shared8 ${fill("u", i, 2)}")) ++
      (0L until 15L).map(i => (10000L + i, s"zq ${fill("g", i, 9)}")) ++
      (0L until 15L).map(i => (20000L + i, s"zq ${fill("g", i, 8)} h$i"))
    val docs = rows.toDF("id", "text")
    val fast = SetSimilarityJoin.jaccardSelfJoin(docs, "id", "text", t)
      .select("a", "b", "inter").as[(Long, Long, Int)].collect().toSet
    val brute = SetSimilarityJoin.jaccardBruteForce(docs, "id", "text", t)
      .select("a", "b", "inter").as[(Long, Long, Int)].collect().toSet
    assert(fast == brute,
      s"PPJoin prunes must be lossless: missing=${brute -- fast} " +
        s"extra=${fast -- brute}")
    if (t == 0.8)
      assert(brute == (0L until 15L).map(i =>
        (10000L + i, 20000L + i, 9)).toSet)
    else assert(brute.isEmpty)
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
