package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("madOutliers: hand-computed median/MAD and outlier count") {
    // group g: values 1..9 plus one wild 1000
    // median of (1..9, 1000) = (5+6)/2 = 5.5
    // deviations |v-5.5|: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5
    // sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5 → MAD = (2.5+2.5)/2 = 2.5
    // cutoff = 3·1.4826·2.5 = 11.1195 → only 1000 is outside
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("k", "v")
    val out = Stats.madOutliers(df, "k", "v").collect().head
    assert(out.getAs[Long]("n") == 10)
    assert(out.getAs[Long]("median_e6") == 5500000L)
    assert(out.getAs[Long]("mad_e6") == 2500000L)
    assert(out.getAs[Long]("n_outliers") == 1)
  }

  test("madOutliers: odd/even groups and negative values hit the exact ranks") {
    // odd group: median is exactly the middle element (-1); deviations
    // 4,0,4 -> MAD 4. even group: median = mean of the two middles
    // ((-2+4)/2 = 1); deviations sorted 3,3,9,9 -> MAD (3+9)/2 = 6.
    val odd = Seq(-5.0, -1.0, 3.0).map(("o", _))
    val even = Seq(-8.0, -2.0, 4.0, 10.0).map(("e", _))
    val out = Stats.madOutliers((odd ++ even).toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("o").getAs[Long]("median_e6") == -1000000L)
    assert(out("o").getAs[Long]("mad_e6") == 4000000L)
    assert(out("o").getAs[Long]("n_outliers") == 0)
    assert(out("e").getAs[Long]("median_e6") == 1000000L)
    assert(out("e").getAs[Long]("mad_e6") == 6000000L)
    assert(out("e").getAs[Long]("n_outliers") == 0)
  }

  test("kaplanMeier: censor-only input emits no steps; lone death hits 0") {
    val censored = Seq((1L, 0), (2L, 0), (3L, 0)).toDF("t", "e")
    assert(Stats.kaplanMeier(censored, "t", "e").count() == 0,
      "all-censored input must produce an empty curve")
    val lone = Seq((2L, 1)).toDF("t", "e")
    val r = Stats.kaplanMeier(lone, "t", "e").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("deaths") == 1L)
    assert(r.head.getAs[Long]("n_risk") == 1L)
    assert(r.head.getAs[Long]("survival_e6") == 0L,
      "d = n_risk quantizes the factor to 0 exactly")
  }

  test("welchTTest matches a closed-form reference computation") {
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0)
    val b = Seq(9.0, 9.5, 10.0, 10.5)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val r = Stats.welchTTest(df, "g", "v", "a", "b").collect().head
    def meanVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val se2 = va / a.size + vb / b.size
    val t = (ma - mb) / math.sqrt(se2)
    val dof = se2 * se2 / (math.pow(va / a.size, 2) / (a.size - 1) +
      math.pow(vb / b.size, 2) / (b.size - 1))
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 4)
    assert(math.abs(r.getAs[Double]("t_stat") -
      math.rint(t * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getAs[Double]("dof") - dof) < 1e-3)
  }

  test("chiSquare: independent columns give chi2 ~ 0; exact 2x2 formula") {
    // perfectly independent 2x2: counts proportional to margins
    val ind = Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val r0 = Stats.chiSquare(ind.toDF("a", "b"), "a", "b").collect().head
    assert(r0.getAs[Double]("chi2") == 0.0)
    assert(r0.getAs[Long]("dof") == 1)

    // dependent 2x2 with known chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    val dep = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val r1 = Stats.chiSquare(dep.toDF("a", "b"), "a", "b").collect().head
    val expected = 80.0 * math.pow(30 * 30 - 10 * 10, 2) /
      (40.0 * 40 * 40 * 40)
    assert(math.abs(r1.getAs[Double]("chi2") - expected) < 1e-6)
    val v = math.sqrt(expected / 80.0)
    assert(math.abs(r1.getAs[Double]("cramers_v") - v) < 1e-5)
  }

  test("mutualInformation: independent -> 0 bits; identical -> H(A), NMI 1") {
    val ind = Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(20)(("y", "q"))
    val r0 = Stats.mutualInformation(ind.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r0.getAs[Double]("mi_bits") == 0.0)
    assert(r0.getAs[Double]("h_a") == 1.0)

    // b == a (renamed values): MI = H(A) = 1 bit, NMI = 1
    val same = (Seq.fill(30)(("x", "px")) ++ Seq.fill(30)(("y", "py")))
    val r1 = Stats.mutualInformation(same.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r1.getAs[Double]("mi_bits") == 1.0)
    assert(r1.getAs[Double]("nmi") == 1.0)
  }

  test("benfordScan: planted Benford sample has near-zero deviation") {
    // construct counts proportional to log10(1+1/d) out of 10000
    val counts = (1 to 9).map(d =>
      d -> math.round(10000 * math.log10(1.0 + 1.0 / d)).toInt)
    // d * 10^k shapes keep the first significant digit at d
    val clean = counts.flatMap { case (d, c) =>
      (0 until c).map(i => ("g", d * math.pow(10, i % 3))) }
    val r = Stats.benfordScan(clean.toDF("g", "v"), "g", "v").collect().head
    assert(r.getAs[Double]("max_dev") < 0.001, s"dev=${r.getAs[Double]("max_dev")}")
    // uniform digits deviate strongly
    val uni = (1 to 9).flatMap(d => Seq.fill(100)(("u", d * 1.0)))
    val r2 = Stats.benfordScan(uni.toDF("g", "v"), "g", "v").collect().head
    assert(r2.getAs[Double]("max_dev") > 0.15)
    assert(r2.getAs[Double]("benford_chi2") > 100)
  }

  test("benford digit extraction: decimals, tiny magnitudes, negatives") {
    val df = Seq(("g", 0.00456), ("g", -123.4), ("g", 0.9999999999),
      ("g", 7.0), ("g", 1023.5)).toDF("k", "v")
    val r = Stats.benfordScan(df, "k", "v")
    // digits: 4, 1, 1 (rounds to 1.000000000), 7, 1 → n=5
    assert(r.collect().head.getAs[Long]("n") == 5)
  }

  test("ksTest: identical samples -> 0; disjoint ranges -> 1; hand case") {
    val same = (1 to 50).flatMap(i => Seq(("a", i * 1.0), ("b", i * 1.0)))
    val r0 = Stats.ksTest(same.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    assert(r0.getAs[Double]("ks") == 0.0 && r0.getAs[Double]("emd") == 0.0)

    val disj = (1 to 20).map(i => ("a", i * 1.0)) ++
      (1 to 20).map(i => ("b", 100.0 + i))
    val r1 = Stats.ksTest(disj.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    assert(r1.getAs[Double]("ks") == 1.0)

    // A = {1,2,3,4}, B = {3,4,5,6}: F_A-F_B peaks at |1/2-0| = 1/2 at v=2
    // EMD = ∫|F_A-F_B| = gaps: [1,2):.25 [2,3):.5 [3,4):.5 [4,5):.5
    //   wait F at v=3: A=3/4,B=1/4 → .5; v=4: 1 vs .5 → .5; v=5: 1 vs .75
    //   → .25; total = 1·(.25+.5+.5+.5+.25) = 2.0
    val ab = Seq(1, 2, 3, 4).map(v => ("a", v * 1.0)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v * 1.0))
    val r2 = Stats.ksTest(ab.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    assert(r2.getAs[Double]("ks") == 0.5)
    assert(r2.getAs[Double]("emd") == 2.0)
  }

  test("transitionMatrix: hand-built sequences; rows sum to 1") {
    // user 1: x→y→x→y ; user 2: x→x→y (ordered by t)
    val df = Seq(
      (1L, 1L, "x"), (1L, 2L, "y"), (1L, 3L, "x"), (1L, 4L, "y"),
      (2L, 1L, "x"), (2L, 2L, "x"), (2L, 3L, "y"))
      .toDF("k", "t", "st")
    val out = Stats.transitionMatrix(df, "k", Seq("t"), "st")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // transitions: u1: xy, yx, xy; u2: xx, xy → x→y:3, y→x:1, x→x:1
    assert(out(("x", "y"))._1 == 3L && out(("y", "x"))._1 == 1L &&
      out(("x", "x"))._1 == 1L)
    assert(math.abs(out(("x", "y"))._2 - 0.75) < 1e-6)
    assert(math.abs(out(("x", "x"))._2 - 0.25) < 1e-6)
    assert(out(("y", "x"))._2 == 1.0)
  }

  test("kaplanMeier matches the hand-computed curve incl. censoring") {
    // classic fixture: deaths at t=1 (n=6), t=3 (n=4 after a censor at 2),
    // censor at 2 and 4, death at 5 with everyone left dying
    val df = Seq(
      (1L, 1), (1L, 1),          // two deaths at 1   n=6 → S=4/6
      (2L, 0),                   // censored at 2
      (3L, 1),                   // death at 3        n=3 → S=4/6·2/3
      (4L, 0),                   // censored at 4
      (5L, 1)                    // death at 5        n=1 → S=0
    ).toDF("t", "e")
    val out = Stats.kaplanMeier(df, "t", "e")
      .select("t", "deaths", "n_risk", "survival_e6")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((2L, 6L, 666667L)))   // round((4/6)·1e6)
    assert(out(3L)._1 == 1L && out(3L)._2 == 3L)
    // grid-quantized fold: 0.666667 · 0.666667 = 0.444444888…
    assert(out(3L)._3 == 444445L)
    assert(out(5L) == ((1L, 1L, 0L)), "full-death tail must reach 0 exactly")
    assert(!out.contains(2L) && !out.contains(4L),
      "censor-only times emit no curve step")
  }

  test("holtForecast tracks a linear series exactly in the limit") {
    // x_t = 10 + 2t: Holt with any alpha/beta converges to level = x_t,
    // trend = 2 (exactly linear input is a fixed point of the recurrence)
    val xs = (1 to 60).map(t => (1L, t.toLong, t.toLong, 10.0 + 2 * t))
    val df = xs.toDF("k", "t", "tie", "v")
    val r = graft.operators.EventAnalytics.holtForecast(df, "k", "t",
      "tie", "v", alpha = 0.5, beta = 0.3).collect().head
    assert(math.abs(r.getAs[Double]("trend") - 2.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("level") - 130.0) < 1e-2)
    assert(math.abs(r.getAs[Double]("forecast") - 132.0) < 1e-2)
  }

  test("holtForecast matches a reference fold on random sequences") {
    val rnd = new java.util.Random(9)
    val xs = (1 to 40).map(t => (1L, t.toLong, t.toLong, rnd.nextDouble() * 50))
    val r = graft.operators.EventAnalytics.holtForecast(
      xs.toDF("k", "t", "tie", "v"), "k", "t", "tie", "v", 0.25, 0.1)
      .collect().head
    var l = xs.head._4; var b = 0.0
    xs.tail.foreach { case (_, _, _, x) =>
      val ln = 0.25 * x + 0.75 * (l + b)
      b = 0.1 * (ln - l) + 0.9 * b; l = ln
    }
    assert(math.abs(r.getAs[Double]("level") - l) < 1e-6)
    assert(math.abs(r.getAs[Double]("trend") - b) < 1e-6)
  }

  test("rollingMedian: warm-up slices interpolate, steady window exact") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (1L, 4L, 100.0), (1L, 5L, 50.0), (1L, 6L, 60.0))
      .toDF("k", "t", "v")
    val out = Stats.rollingMedian(df, "k", Seq("t"), "v", 5)
      .select("t", "rolling_median").as[(Long, Double)].collect().toMap
    assert(out(1L) == 10.0)            // [10]
    assert(out(2L) == 15.0)            // [10,20] → mean of middles
    assert(out(3L) == 20.0)            // [10,20,30]
    assert(out(4L) == 25.0)            // [10,20,30,100] → (20+30)/2
    assert(out(5L) == 30.0)            // [10,20,30,50,100]
    assert(out(6L) == 50.0)            // [20,30,50,60,100]
  }
}
