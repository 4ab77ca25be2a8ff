package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("level binning matches a sequential fold and keeps order") {
    val rng = new scala.util.Random(7)
    val files = (1 to 200).map(i => ("p" + (i % 3), i.toLong,
      (rng.nextInt(40) + 1).toLong * 1000))
    val target = 50000L
    val got = Compaction.plan(files.toDF("k", "id", "bytes"),
        Seq("k"), "id", "bytes", target)
      .select("k", "id", "bytes", "bin")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    for ((_, group) <- got) {
      // reference: bin = floor(running-before / target)
      var before = 0L
      for ((_, _, bytes, bin) <- group) {
        assert(bin == before / target)
        before += bytes
      }
      // bins are non-decreasing in file order (clustering preserved)
      assert(group.map(_._4).sliding(2).forall(w => w.head <= w.last))
    }
  }

  test("summary accounts for every file exactly once") {
    val files = Seq(("a", 1L, 30L), ("a", 2L, 30L), ("a", 3L, 30L),
      ("b", 1L, 100L)).toDF("k", "id", "bytes")
    val planned = Compaction.plan(files, Seq("k"), "id", "bytes", 50L)
    val sum = Compaction.summarize(planned, Seq("k"), "id", "bytes")
      .select("k", "bin", "n_files", "total_bytes")
      .as[(String, Long, Long, Long)].collect().toSet
    // a: 30|30 -> bin0 (before 0, 30), 30 -> bin1 (before 60); b: bin0
    assert(sum == Set(("a", 0L, 2L, 60L), ("a", 1L, 1L, 30L),
      ("b", 0L, 1L, 100L)))
  }
}
