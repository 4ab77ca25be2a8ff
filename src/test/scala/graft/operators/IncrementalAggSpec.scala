package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val ms = Seq("v")

  private def facts(rows: Seq[(String, Double)]): DataFrame =
    rows.toDF("k", "v")

  private def snapshot(df: DataFrame): Set[(String, Long, Double, Double, Double, Double)] =
    IncrementalAgg.finalized(df, keys, ms)
      .select("k", "n", "sum_v", "min_v", "max_v", "avg_v")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSet

  test("incremental fold over three batches equals full recompute") {
    val rng = new scala.util.Random(42)
    val all = Seq.fill(300)((s"k${rng.nextInt(7)}", rng.nextInt(1000) / 10.0))
    val (b1, rest) = all.splitAt(100)
    val (b2, b3) = rest.splitAt(100)
    val inc = IncrementalAgg.merge(
      IncrementalAgg.merge(
        IncrementalAgg.partials(facts(b1), keys, ms),
        IncrementalAgg.partials(facts(b2), keys, ms), keys, ms),
      IncrementalAgg.partials(facts(b3), keys, ms), keys, ms)
    val full = IncrementalAgg.partials(facts(all), keys, ms)
    val got = snapshot(inc)
    val want = snapshot(full)
    // counts / min / max are exact; sums may differ by float ordering
    def round(s: Set[(String, Long, Double, Double, Double, Double)]) =
      s.map { case (k, n, su, mi, ma, av) =>
        (k, n, math.rint(su * 1e6), mi, ma, math.rint(av * 1e6)) }
    assert(round(got) == round(want))
  }

  test("merge is commutative") {
    val a = IncrementalAgg.partials(facts(Seq(("x", 1.0), ("y", 2.0))), keys, ms)
    val b = IncrementalAgg.partials(facts(Seq(("x", 5.0), ("z", 7.0))), keys, ms)
    assert(snapshot(IncrementalAgg.merge(a, b, keys, ms)) ==
      snapshot(IncrementalAgg.merge(b, a, keys, ms)))
  }

  test("merging an empty delta is the identity") {
    val a = IncrementalAgg.partials(facts(Seq(("x", 1.0), ("x", 3.0))), keys, ms)
    val empty = IncrementalAgg.partials(facts(Seq.empty), keys, ms)
    assert(snapshot(IncrementalAgg.merge(a, empty, keys, ms)) == snapshot(a))
    val row = snapshot(a).head
    assert(row == (("x", 2L, 4.0, 1.0, 3.0, 2.0)))
  }

  test("avg over NULL-bearing measures matches SQL AVG (non-null count)") {
    import spark.implicits._
    // (10.0, NULL) for one group: AVG = 10.0, not sum/rowcount = 5.0 —
    // the state must carry the measure's non-null count to recover it
    val df = Seq(("x", Some(10.0)), ("x", None), ("y", None))
      .toDF("k", "v")
    val st = IncrementalAgg.partials(df, keys, ms)
    val fin = IncrementalAgg.finalized(st, keys, ms)
      .select("k", "n", "avg_v")
      .as[(String, Long, Option[Double])].collect()
      .map { case (k, n, a) => k -> ((n, a)) }.toMap
    assert(fin("x") == ((2L, Some(10.0))), s"got ${fin("x")}")
    // an all-NULL group yields NULL avg, like SQL AVG
    assert(fin("y") == ((1L, None)), s"got ${fin("y")}")
    // the incremental path agrees with a direct AVG after a merge
    val d2 = IncrementalAgg.partials(
      Seq(("x", Some(20.0)), ("y", Some(4.0))).toDF("k", "v"), keys, ms)
    val merged = IncrementalAgg.finalized(
        IncrementalAgg.merge(st, d2, keys, ms), keys, ms)
      .select("k", "avg_v").as[(String, Option[Double])].collect().toMap
    assert(merged == Map("x" -> Some(15.0), "y" -> Some(4.0)))
  }
}
