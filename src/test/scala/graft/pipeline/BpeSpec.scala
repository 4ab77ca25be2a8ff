package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bpe.learnMerges/tokenCounts against a hand-rolled Sennrich-style
  * reference trainer (greedy left-to-right merge, count-desc then
  * lexicographic tie-break). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference: word-dict BPE. Returns the merge list and
    * the final symbol table. */
  private def refBpe(wordFreq: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var symsOf: Map[String, Seq[String]] =
      wordFreq.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((w, s) <- symsOf; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + wordFreq(w)
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += ((l, r, c))
        symsOf = symsOf.map { case (w, s) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += l + r; i += 2 // greedy, resume after the merge
            } else { out += s(i); i += 1 }
          }
          w -> out.toSeq
        }
      }
    }
    (merges.toSeq, symsOf)
  }

  test("learned merges and symbol counts match the reference trainer") {
    // freqs chosen to exercise a count tie (bb vs cc words) and
    // an overlap case (aaaa)
    val docs = Seq(
      "aaaa bb cc aaaa",
      "bb cc dog dog",
      "aaaa dog cc bb")
    val wordFreq: Map[String, Long] = docs.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val (wantMerges, wantSyms) = refBpe(wordFreq, 5)
    val model = Bpe.learnMerges(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", 5)
    assert(model.merges.map(m => (m.lhs, m.rhs, m.cnt)) == wantMerges)
    val gotSyms = model.wordSymbols.as[(String, Long, Int)].collect()
      .map { case (w, _, n) => w -> n }.toMap
    assert(gotSyms == wantSyms.map { case (w, s) => w -> s.length })
    // the overlap contract specifically: after ONE merge of (a,a),
    // 4 a's -> [aa, aa] (greedy non-overlapping), never [aa, a, a]
    val one = Bpe.learnMerges(
      Seq((1L, "aaaa")).toDF("doc_id", "text"), "text", 1)
    assert(one.merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "a")))
    assert(one.wordSymbols.as[(String, Long, Int)].collect()
      .head._3 == 2)
  }

  test("tokenCounts sums per-word symbol counts over doc occurrences") {
    val docs = Seq((1L, "aaaa bb aaaa"), (2L, "bb"), (3L, "Bad-Token bb"))
      .toDF("doc_id", "text")
    val model = Bpe.learnMerges(docs, "text", 2) // merges (a,a) then (aa,aa)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // after 2 merges aaaa is 1 symbol, bb is... (b,b) count 3 vs (a,a)
    // count 4: round1 merges (a,a); round2 counts (aa,aa)=2 < (b,b)=3
    // so round2 merges (b,b) -> aaaa=[aa,aa]=2 syms, bb=[bb]=1 sym
    assert(got(1L) == ((3L, 5L)))
    assert(got(2L) == ((1L, 1L)))
    // "bad-token" fails [a-z0-9]+ (hyphen) and is excluded from counts
    assert(got(3L) == ((1L, 1L)))
  }
}
