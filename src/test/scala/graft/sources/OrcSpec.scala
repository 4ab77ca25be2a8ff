package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class OrcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip is value-exact against the parquet original") {
    val src = graft.Tables.load(spark, dir, "documents")
    val tmp = graft.util.Scratch.dir("orc_spec")
    Orc.write(src, tmp, partitions = 4)
    val back = Orc.read(spark, tmp)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("predicates and projections reach the ORC scan") {
    val src = graft.Tables.load(spark, dir, "documents")
    val tmp = graft.util.Scratch.dir("orc_spec2")
    Orc.write(src, tmp, partitions = 4)
    val plan = Orc.read(spark, tmp)
      .filter(col("n_chars") >= 200)
      .select(col("doc_id"), col("n_chars"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(n_chars,200)"), plan.take(2000))
    // column pruning: only the 2 referenced columns reach the scan
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      plan.take(2000))
  }

  test("writer sizes splittable units via repartition") {
    val src = graft.Tables.load(spark, dir, "documents")
    val tmp = graft.util.Scratch.dir("orc_spec3")
    Orc.write(src, tmp, partitions = 4)
    val files = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".orc"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
  }
}
