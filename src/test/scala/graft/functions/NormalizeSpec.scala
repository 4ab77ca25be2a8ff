package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(s: String): String =
    Normalize.stripAccentsKernel(UTF8String.fromString(s)).toString

  test("kernel strips Latin accents and keeps undecomposable letters") {
    assert(strip("café déjà-vu naïve") === "cafe deja-vu naive")
    assert(strip("ÁÉÎÖÜ ñ ç") === "AEIOU n c")
    // no canonical decomposition → pass through (DuckDB contract)
    assert(strip("høj æble") === "høj æble")
    assert(strip("") === "")
  }

  test("ASCII fast path returns the input buffer unchanged") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(Normalize.stripAccentsKernel(in) eq in)
  }

  test("column form handles nulls and joins accented to plain variants") {
    val out = Seq(Some("Müller"), Some("Muller"), None).toDF("s")
      .select(Normalize.strip_accents(col("s")).as("t"))
      .as[Option[String]].collect().toSeq
    assert(out === Seq(Some("Muller"), Some("Muller"), None))
  }

  test("codegen and interpreted paths agree") {
    val data = Seq("café", "völlig ätzend", "plain", "ølß", "ﬁ ﬂ")
    val df = data.toDF("s")
    val viaCodegen = df.select(Normalize.strip_accents(col("s")))
      .as[String].collect().toSeq
    val interpreted = data.map(strip)
    assert(viaCodegen === interpreted)
  }

  test("strip_accents is SQL-registered via GraftExtensions") {
    val out = spark.sql("SELECT strip_accents('àrrivé') AS s")
      .as[String].head()
    assert(out === "arrive")
  }
}
