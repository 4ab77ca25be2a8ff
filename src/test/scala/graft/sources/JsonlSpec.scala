package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.TestSpark

class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, text STRING")

  test("roundtrip preserves newlines, quotes, unicode, and nulls") {
    val rows = Seq(
      (1L, Some("line one\nline two\ttabbed")),
      (2L, Some("\"quoted\" and \\backslash\\")),
      (3L, Some("unicode: café 北京 ø")),
      (4L, None))
    val dir = Files.createTempDirectory("jsonl_rt").toString
    Jsonl.write(rows.toDF("id", "text"), dir)
    val back = Jsonl.read(spark, dir, schema)
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(back === rows)
  }

  test("quarantine read: broken lines preserved, good rows parsed") {
    val dir = Files.createTempDirectory("jsonl_q").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"id": 1, "text": "ok"}
        |this is not json at all
        |{"id": "NaN-ish", "text": 7}
        |{"id": 3, "text": "also ok"}
        |""".stripMargin)
    val back = Jsonl.readWithQuarantine(spark, dir, schema)
    val good = back.filter(!Jsonl.isCorrupt)
      .select("id", "text").as[(Long, String)].collect().toSet
    // a data column must ride along: Spark refuses to answer queries
    // that touch ONLY the corrupt column of a raw JSON scan
    val bad = back.filter(Jsonl.isCorrupt)
      .select(col("id"), col(Jsonl.CorruptCol))
      .as[(Option[Long], String)].collect().map(_._2).toSet
    assert(good === Set((1L, "ok"), (3L, "also ok")))
    assert(bad.size === 2)
    assert(bad.exists(_.startsWith("this is not json")))
  }

  test("strict read fails fast on malformed input") {
    val dir = Files.createTempDirectory("jsonl_ff").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"text\": \"ok\"}\nbroken\n")
    val e = intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, dir, schema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      e.getCause != null)
  }

  test("partitioned write produces multiple splittable files") {
    val dir = Files.createTempDirectory("jsonl_p").toString
    Jsonl.write(spark.range(100).select(col("id"),
      concat(lit("d"), col("id")).as("text")), dir, partitions = 4)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts === 4)
    assert(Jsonl.read(spark, dir, schema).count() === 100)
  }
}
