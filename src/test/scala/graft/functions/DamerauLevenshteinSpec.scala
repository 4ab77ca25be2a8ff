package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark

class DamerauLevenshteinSpec extends AnyFunSuite {
  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("known distances, including the unrestricted-transposition case") {
    assert(dl("", "") == 0)
    assert(dl("abc", "") == 3 && dl("", "abc") == 3)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("ab", "ba") == 1)           // one transposition
    assert(dl("CA", "ABC") == 2)          // TRUE DL (OSA would say 3)
    assert(dl("abcdef", "abcfad") == 3)
    assert(dl("same", "same") == 0)
  }

  test("codepoint semantics: non-BMP characters count as ONE unit") {
    // U+1F600 GRINNING FACE is 2 UTF-16 code units; DuckDB's native
    // damerau_levenshtein (the shared-SQL oracle) counts code points,
    // so replacing one astral char must cost 1, not 2
    val grin = new String(Character.toChars(0x1F600))
    val rocket = new String(Character.toChars(0x1F680))
    assert(dl(grin, rocket) == 1)
    assert(dl(s"a${grin}b", s"a${rocket}b") == 1)
    assert(dl(s"$grin$rocket", s"$rocket$grin") == 1,
      "astral transposition is one edit")
    assert(dl(grin, "") == 1 && dl("", grin) == 1)
    assert(dl("héllo", "hello") == 1)
  }

  test("metric properties on random strings") {
    val rnd = new java.util.Random(21)
    def rs() = (0 until 1 + rnd.nextInt(10))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (0 until 300).foreach { _ =>
      val (a, b, c) = (rs(), rs(), rs())
      assert(dl(a, b) == dl(b, a), s"symmetry: $a/$b")
      assert(dl(a, a) == 0)
      assert(dl(a, b) <= dl(a, c) + dl(c, b),
        s"triangle: $a/$b via $c")
      assert(dl(a, b) <= math.max(a.length, b.length))
      assert(dl(a, b) >= math.abs(a.length - b.length))
    }
  }

  test("never exceeds plain Levenshtein; beats it on transposed pairs") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(4)
    def rs() = (0 until 3 + rnd.nextInt(8))
      .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val pairs = (0 until 200).map(_ => (rs(), rs())).toDF("a", "b")
    val out = pairs.select(
        DamerauLevenshtein.damerau_levenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
      .as[(Int, Int)].collect()
    assert(out.forall { case (d, l) => d <= l })
    assert(dl("abcd", "badc") < 4 &&
      dl("abcd", "badc") <= 2, "two transpositions = 2")
  }
}
