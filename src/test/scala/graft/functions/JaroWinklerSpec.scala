package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark
import graft.core.{JaroWinklerSimilarity, SimilarityFn}

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b),
      winkler = true)
  private def jaro(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b),
      winkler = false)

  test("goldens pinned to DuckDB jaro_winkler_similarity / jaro_similarity") {
    // every value below cross-checked against DuckDB 1.0.0 this session
    val cases = Seq(
      // (a, b, jaro, jw)
      ("martha", "marhta", 0.9444444444, 0.9611111111),
      ("DIXON", "DICKSONX", 0.7666666667, 0.8133333333),
      ("abc", "abc", 1.0, 1.0),
      ("abc", "", 0.0, 0.0),
      ("", "", 0.0, 0.0), // DuckDB: either side empty => 0, even both
      ("a", "b", 0.0, 0.0),
      ("ab", "ba", 0.0, 0.0), // window 0: no same-position matches
      ("prefixxxxxxlong", "prefixyyyyylong", 0.7777777778, 0.8666666667),
      ("aaaaaaaaaa", "aaaaabaaaa", 0.9333333333, 0.9600000000),
      ("CRATE", "TRACE", 0.7333333333, 0.7333333333), // no common prefix
      ("abcdefgh", "abcdxfgh", 0.9166666667, 0.9500000000),
      ("ab", "abcdefghij", 0.7333333333, 0.7866666667),
      ("zzzz", "zzza", 0.8333333333, 0.8833333333),
      ("ax", "ay", 0.6666666667, 0.6666666667), // jaro < 0.7: no boost
      ("ababab", "bababa", 0.8333333333, 0.8333333333),
      // integer-floored half-transposition cases (the rapidfuzz size_t
      // division) — these distinguish t=floor(h/2) from t=h/2.0
      ("old plate", "small rings", 0.5193602694, 0.5193602694),
      ("old anvil", "small rings", 0.6262626263, 0.6262626263))
    cases.foreach { case (a, b, ej, ejw) =>
      assert(math.abs(jaro(a, b) - ej) < 1e-9, s"jaro($a, $b)")
      assert(math.abs(jw(a, b) - ejw) < 1e-9, s"jw($a, $b)")
    }
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val pairs = Seq(("martha", "marhta"), ("old plate", "small rings"),
      ("", "x"), ("same", "same"))
    val df = pairs.toDF("a", "b")
    val viaExpr = df.select(
      JaroWinkler.jaro_winkler(col("a"), col("b"))).as[Double].collect()
    pairs.zip(viaExpr).foreach { case ((a, b), s) =>
      assert(math.abs(s - jw(a, b)) < 1e-15, s"($a, $b)")
    }
    val r = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaro_winkler(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL surface via extensions and temp registration") {
    JaroWinkler.register(spark)
    Seq(("martha", "marhta")).toDF("a", "b").createOrReplaceTempView("jwv")
    val r = spark.sql(
      "SELECT jaro_winkler(a, b) AS w, jaro_sim(a, b) AS j FROM jwv").head()
    assert(math.abs(r.getDouble(0) - 0.9611111111) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.9444444444) < 1e-9)
  }

  test("astral code points compare as single characters") {
    import org.apache.spark.unsafe.types.UTF8String
    // U+1D552 vs U+1D553: distinct code points sharing a high surrogate.
    // A UTF-16 kernel would see length-2 strings with a matching first
    // unit and report a spurious similarity; code-point semantics (the
    // DuckDB/rapidfuzz convention) see two distinct 1-char strings.
    val a = UTF8String.fromString(new String(Character.toChars(0x1D552)))
    val b = UTF8String.fromString(new String(Character.toChars(0x1D553)))
    assert(JaroWinkler.sim(a, b, winkler = true) == 0.0)
    assert(JaroWinkler.sim(a, a, winkler = true) == 1.0)
  }

  test("registry similarity: truncated-rescaled onto [0, maxSim]") {
    val fn = SimilarityFn.fromName("jaro_winkler", threshold = 7.0,
      maxSimilarity = 10.0)
    assert(fn == JaroWinklerSimilarity(7.0, 10.0))
    // jw = 0.9611: raw = 9.611; rescaled = (9.611-7)*10/3
    assert(math.abs(fn.sim("martha", "marhta") -
      (0.9611111111 * 10 - 7.0) * 10.0 / 3.0) < 1e-9)
    // sub-threshold truncates to zero
    assert(fn.sim("old plate", "small rings") == 0.0)
  }
}
