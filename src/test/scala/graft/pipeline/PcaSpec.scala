package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pcaTopComponent against a corpus with a planted dominant direction. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  test("recovers a planted dominant direction") {
    // planted unit direction d ~ (1,1,0,...)/sqrt(2); 200 points
    // t*d + small deterministic orthogonal noise, t in [-2, 2]
    val d = Array.tabulate(dim)(i => if (i < 2) 1.0 / math.sqrt(2) else 0.0)
    val pts = (0 until 200).map { k =>
      val t = -2.0 + 4.0 * k / 199.0
      val noise = Array.tabulate(dim)(i =>
        if (i >= 2) 0.05 * math.sin(k * (i + 1)) else 0.0)
      (k.toLong, Array.tabulate(dim)(i => (t * d(i) + noise(i)).toFloat))
    }
    val got = VectorOps.pcaTopComponent(
        pts.toDF("vec_id", "embedding"), "embedding", dim, iters = 8)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == dim)
    val v = got.map(_._2.toDouble / 1e7)
    val cos = v.zip(d).map { case (a, b) => a * b }.sum /
      math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(cos) > 0.999, s"|cos(v, planted)| = ${math.abs(cos)}")
    // population variance along d for t uniform-grid on [-2,2] is ~4/3;
    // the top eigenvalue must carry almost all the trace
    val lambda = got.head._3.toDouble / 1e7
    val trace = got.head._4.toDouble / 1e7
    val share = got.head._5.toDouble / 1e6
    assert(math.abs(lambda - 4.0 / 3.0) < 0.02, s"lambda = $lambda")
    assert(share > 0.99, s"share = $share")
    assert(math.abs(share - lambda / trace) < 2e-6)
  }

  test("pcaProject recovers the planted coordinate up to sign") {
    val d = Array.tabulate(dim)(i => if (i < 2) 1.0 / math.sqrt(2) else 0.0)
    val pts = (0 until 100).map { k =>
      val t = -2.0 + 4.0 * k / 99.0
      (k.toLong, Array.tabulate(dim)(i => (t * d(i)).toFloat), t)
    }
    val df = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val model = VectorOps.pcaModel(df, "embedding", dim, 8)
    val got = VectorOps.pcaProject(df, "vec_id", "embedding", model)
      .as[(Long, Long)].collect().toMap
    // centered coordinates match t - mean(t) up to a global sign
    val tm = pts.map(_._3).sum / pts.size
    val sgn = math.signum(got(99L).toDouble) *
      math.signum(pts(99)._3 - tm)
    for ((id, _, t) <- pts)
      assert(math.abs(got(id).toDouble / 1e6 - sgn * (t - tm)) < 1e-4,
        s"vec $id")
  }

  test("iterate components stay on the 1e-7 grid and are partition-stable") {
    val pts = (0 until 60).map(k =>
      (k.toLong, Array.tabulate(dim)(i =>
        (math.cos(k * 0.7 + i) * (i + 1)).toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val a = VectorOps.pcaTopComponent(df, "embedding", dim, 8)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = VectorOps.pcaTopComponent(df.repartition(7), "embedding", dim, 8)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b) // quantized moments erase partial-agg order
    // eigenvector is unit-norm within grid resolution
    val n = math.sqrt(a.map(r => math.pow(r._2.toDouble / 1e7, 2)).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }
}
