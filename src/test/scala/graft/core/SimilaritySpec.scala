package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden values from the reference's public test suite semantics
  * (/root/reference SimilarityFnTest — see FIXTURES.md §5). */
class SimilaritySpec extends AnyFunSuite {

  test("levenshtein distance basics") {
    assert(Levenshtein.distance("", "") == 0)
    assert(Levenshtein.distance("abc", "") == 3)
    assert(Levenshtein.distance("", "abc") == 3)
    assert(Levenshtein.distance("kitten", "sitting") == 3)
    assert(Levenshtein.distance("AB", "BB") == 1)
    assert(Levenshtein.distance("flaw", "lawn") == 2)
  }

  test("truncated similarity goldens (max=10)") {
    val s5 = LevenshteinSimilarity(5.0, 10.0)
    assert(math.abs(s5.sim("AB", "BB") - 2.0) < 1e-9)
    val s0 = LevenshteinSimilarity(0.0, 10.0)
    assert(math.abs(s0.sim("AB", "BB") - 6.0) < 1e-9)
    assert(math.abs(s5.sim("same", "same") - 10.0) < 1e-9)
    assert(s5.sim("", "nonempty") == 0.0)
  }

  test("similarity is symmetric and bounded") {
    val s = LevenshteinSimilarity(7.0, 10.0)
    val pairs = Seq(("CARSTEN", "KARSTEN"), ("MEIER", "MEYER"), ("A", "ZZZZZ"))
    pairs.foreach { case (a, b) =>
      assert(math.abs(s.sim(a, b) - s.sim(b, a)) < 1e-12)
      assert(s.sim(a, b) >= 0.0 && s.sim(a, b) <= 10.0)
    }
  }

  test("constant similarity is zero everywhere") {
    assert(ConstantSimilarity.sim("a", "b") == 0.0)
    assert(ConstantSimilarity.sim("a", "a") == 0.0)
    assert(ConstantSimilarity.expSim("x", "y") == 1.0)
  }

  test("length gap bound is lossless") {
    val s = LevenshteinSimilarity(7.0, 10.0)
    // any pair with |len| gap beyond the bound must have sim == 0
    val words = Seq("a", "ab", "abcd", "abcdefgh", "abcdefghijklmnop")
    for (a <- words; b <- words) {
      val gap = math.abs(a.length - b.length)
      if (gap > s.maxLengthGap(math.min(a.length, b.length))) {
        assert(s.sim(a, b) == 0.0, s"($a,$b)")
      }
    }
  }

  test("registry resolves names") {
    assert(SimilarityFn.fromName("constant") == ConstantSimilarity)
    assert(SimilarityFn.fromName("levenshtein", 5.0, 10.0) ==
      LevenshteinSimilarity(5.0, 10.0))
    assertThrows[IllegalArgumentException](SimilarityFn.fromName("nope"))
  }
}
