package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class StatsVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordEntropy equals the direct count-based formula") {
    val docs = Seq(
      (1L, "a b c d"),                  // uniform 4 → 2 bits
      (2L, "a a a a"),                  // single token → 0
      (3L, "a a b b"),                  // uniform 2 → 1 bit
      (4L, "x"),                        // 1 token → 0
      (5L, ""),                         // empty → 0
      (6L, "  the the cat  "),          // 2/3, 1/3
      (7L, "B b A a")                   // lowercased → {a:2, b:2} → 1
    ).toDF("id", "text")
    val out = docs.select(col("id"),
        TextAnalysis.wordEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    def h(counts: Seq[Int]): Double = {
      val n = counts.sum.toDouble
      counts.map(c => -c / n * (math.log(c / n) / math.log(2))).sum
    }
    assert(math.abs(out(1L) - 2.0) < 1e-12)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
    assert(out(4L) == 0.0)
    assert(out(5L) == 0.0)
    assert(math.abs(out(6L) - h(Seq(2, 1))) < 1e-12)
    assert(math.abs(out(7L) - 1.0) < 1e-12)
  }

  test("silhouetteByLabel: separated clusters ~1, interleaved ~<=0") {
    // two tight, far-apart clusters → silhouette near 1 for both labels
    val rnd = new java.util.Random(3)
    def jitter() = (rnd.nextDouble() - 0.5).toFloat * 0.1f
    val good = (0 until 30).map { i =>
      val l = i % 2
      val base = if (l == 0) 0f else 100f
      (i.toLong, Array(base + jitter(), base + jitter()), l)
    }.toDF("id", "vec", "label")
    val g = VectorOps.silhouetteByLabel(good, "id", "vec", "label")
      .as[(Int, Long, Double)].collect()
      .map { case (l, _, s) => l -> s }.toMap
    assert(g.values.forall(_ > 0.9), s"separated clusters: $g")

    // labels assigned independently of position → silhouette <= ~0
    val bad = (0 until 40).map { i =>
      (i.toLong, Array(jitter() * 100, jitter() * 100), i % 2)
    }.toDF("id", "vec", "label")
    val b = VectorOps.silhouetteByLabel(bad, "id", "vec", "label")
      .as[(Int, Long, Double)].collect().map(_._3)
    assert(b.forall(_ < 0.3), s"interleaved labels: ${b.toSeq}")
  }

  test("pqTopK: zero quantization error when vectors ARE centroids") {
    // corpus = the 4 centroids themselves → codes are exact, adist to a
    // query equals its true subspace-sum distance
    val vecs = (0 until 4).map { i =>
      val v = Array.fill(8)(0f); v(i * 2) = 1f; (i.toLong, v)
    }
    val df = vecs.toDF("id", "vec")
    val cen = df.select(col("id").as("cenId"), col("vec").as("cenVec"))
    val out = VectorOps.pqTopK(df, df.filter(col("id") === 0), "id", "vec",
        cen, m = 4, k = 3)
      .select("rank", "cid", "adist").as[(Int, Long, Double)].collect()
    // all other centroids are at L2² = 2 from query 0 (1 lost + 1 gained)
    assert(out.length == 3)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L))
    assert(out.forall(_._3 == 2.0), s"exact distances expected: ${out.toSeq}")
  }

  test("pqTopK approximates brute-force ranking on clustered data") {
    // three tight clusters around distinct axes; PQ with those cluster
    // centers as the codebook must rank same-cluster vectors first
    val rnd = new java.util.Random(5)
    val pts = for { l <- 0 until 3; i <- 0 until 8 } yield {
      val v = Array.fill(6)(0.01f * rnd.nextFloat())
      v(l * 2) = 1f + 0.01f * i
      ((l * 8 + i).toLong, v, l)
    }
    val df = pts.map(p => (p._1, p._2)).toDF("id", "vec")
    val cen = (0 until 3).map { l =>
      val v = Array.fill(6)(0f); v(l * 2) = 1f; (l.toLong, v)
    }.toDF("cenId", "cenVec")
    val out = VectorOps.pqTopK(df, df.filter(col("id") < 3), "id", "vec",
        cen, m = 3, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
    out.foreach { case (qid, cid) =>
      assert(cid / 8 == qid / 8,
        s"query $qid matched cross-cluster vector $cid")
    }
  }

  test("ivfPqTopK: candidates restricted to probed cells, PQ-scored") {
    // clusters on axes; IVF centroids = cluster centers, PQ codebook =
    // the same centers → within-cluster candidates at adist ~0, the
    // probe set must exclude the farthest cluster when nprobe = 2
    val pts = for { l <- 0 until 3; i <- 0 until 6 } yield {
      val v = Array.fill(6)(0f); v(l * 2) = 1f + 0.01f * i
      ((l * 6 + i).toLong, v)
    }
    val df = pts.toDF("id", "vec")
    val cen = (0 until 3).map { l =>
      val v = Array.fill(6)(0f); v(l * 2) = 1f; (l.toLong, v)
    }.toDF("cenId", "cenVec")
    val out = VectorOps.ivfPqTopK(df, df.filter(col("id") === 0), "id",
        "vec", cen, cen, nprobe = 1, m = 3, k = 10)
      .select("cid").as[Long].collect().toSet
    // nprobe=1 → only the query's own cell (cluster 0) is searched
    assert(out == Set(1L, 2L, 3L, 4L, 5L),
      s"nprobe=1 must restrict candidates to the home cell: $out")
  }

  test("aHash64: hand-computable patterns, PNG-roundtrip invariant") {
    val M = Multimodal
    // half-black/half-white 8x8: mean=127, right half above
    val split = M.grayImage(8, 8, (x, _) => if (x < 4) 0 else 255)
    val h1 = M.aHash64(1L, split)
    assert(h1.nAbove == 32)
    assert(h1.bits == "00001111" * 8)
    // flat image: no block exceeds the mean → all zero
    val flat = M.grayImage(16, 12, (_, _) => 77)
    assert(M.aHash64(2L, flat).bits == "0" * 64)
    // the hash must survive a real PNG encode/decode roundtrip
    val grad = M.grayImage(20, 11, (x, y) => (x * 11 + y * 3) % 256)
    val direct = M.aHash64(3L, grad)
    val decoded = M.aHash64(3L, M.decodeImage(M.encodePng(grad)).get)
    assert(direct == decoded, "lossless roundtrip must preserve the hash")
    assert(direct.nAbove > 0 && direct.nAbove < 64)
  }

  test("dbscan: hand fixture with cores, a border point, and noise") {
    // 1-D embeddings, eps=1.5 (eps²=2.25), minPts=3 (self included):
    //  1.0 and 2.0 have two ε-neighbors each → cores (one cluster,
    //  min core id 2); 0.0 reaches only 1.0 and 3.4 only 2.0 → borders
    //  adopting the core cluster; 10.0 → noise
    val pts = Seq((1L, 0.0f), (2L, 1.0f), (3L, 2.0f), (4L, 3.4f),
      (5L, 10.0f)).map { case (id, x) => (id, Array(x)) }
    val df = pts.toDF("id", "vec")
    val out = VectorOps.dbscan(df, "id", "vec", eps = 1.5, minPts = 3)
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L) == ((true, 2L)) && out(3L) == ((true, 2L)),
      s"1.0 and 2.0 are the cores of one cluster: $out")
    assert(out(1L) == ((false, 2L)) && out(4L) == ((false, 2L)),
      s"0.0 and 3.4 are borders adopting the core cluster: $out")
    assert(out(5L) == ((false, -1L)), s"10.0 is noise: $out")
  }

  test("dbscan: LSH candidate path equals the exact all-pairs path") {
    // the 100 TB pair stage (lshCandidatePairs in the full-recall
    // 4-bits × 24-probes config + exact ε verify) must produce the
    // IDENTICAL clustering as the broadcast all-pairs join on a planted
    // near-duplicate corpus: 40 base vectors, each with two perturbed
    // copies (one dimension zeroed) inside ε, plus isolated noise
    val rnd = new java.util.Random(99)
    def vec(seed: Int): Array[Float] = {
      val r = new java.util.Random(seed)
      Array.fill(8)(r.nextFloat() * 4f - 2f)
    }
    val rows = (0 until 40).flatMap { i =>
      val v = vec(i * 7919)
      Seq((i.toLong, v),
        (i + 1000L, v.updated(3, 0.0f)),
        (i + 2000L, v.updated(5, 0.0f)))
    } ++ (0 until 30).map(i => (i + 9000L, vec(i * 104729 + 13)))
    val df = rows.toDF("id", "vec")
    def run(threshold: Long) =
      VectorOps.dbscan(df, "id", "vec", eps = 1.2, minPts = 3,
          exactPairThreshold = threshold)
        .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    val exact = run(1000000L)
    val lsh = run(0L)
    assert(exact.exists(_._2), "fixture must produce cores")
    assert(exact == lsh,
      "LSH-routed DBSCAN must equal exact DBSCAN on the planted corpus")
  }

  test("dbscan: two separated blobs cluster separately; minPts respected") {
    val rnd = new java.util.Random(17)
    def blob(center: Float, ids: Range) = ids.map { i =>
      (i.toLong, Array(center + rnd.nextFloat() * 0.2f,
        rnd.nextFloat() * 0.2f))
    }
    val df = (blob(0f, 0 until 8) ++ blob(50f, 100 until 108) ++
      Seq((999L, Array(25f, 25f)))).toDF("id", "vec")
    val out = VectorOps.dbscan(df, "id", "vec", eps = 1.0, minPts = 3)
      .as[(Long, Boolean, Long)].collect()
    val clusters = out.filter(_._3 >= 0).groupBy(_._3)
    assert(clusters.size == 2, s"two blobs expected: ${out.toSeq}")
    assert(out.find(_._1 == 999L).get._3 == -1L, "isolated point is noise")
    clusters.values.foreach { members =>
      val ids = members.map(_._1)
      assert(ids.forall(_ < 50) || ids.forall(_ >= 100),
        s"blobs must not merge: ${ids.toSeq}")
    }
  }

  test("knnClassify recovers planted labels and breaks ties to smaller") {
    // 3 tight clusters in distinct directions; every query's 5
    // neighbors are its own cluster → prediction = planted label
    val pts = for {
      l <- 0 until 3
      i <- 0 until 10
    } yield {
      val base = Array.fill(4)(0.01f)
      base(l) = 1f + i * 0.001f
      ((l * 10 + i).toLong, base, l)
    }
    val df = pts.toDF("id", "vec", "label")
    val out = VectorOps.knnClassify(df, df.filter(col("id") % 10 === 0),
        "id", "vec", "label", k = 5)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 3)
    out.foreach { case (qid, pred, votes) =>
      assert(pred == (qid / 10).toInt && votes == 5L,
        s"query $qid predicted $pred with $votes votes")
    }
  }
}
