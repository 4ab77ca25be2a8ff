package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON Lines source/sink — the interchange format training corpora
  * actually arrive in (one JSON object per line, UTF-8, usually
  * gzip/zstd per file). The reference reads only CSV and Parquet
  * (`IO.scala`, cited in er/IO.scala here); a curation engine needs the
  * JSONL leg too. Spark's JSON data source IS line-delimited by default,
  * so this module is deliberately thin — its value is encoding the
  * at-scale discipline the raw API leaves optional:
  *
  *  - **Never infer the schema.** Inference is a full extra pass over
  *    the corpus (at 100 TB, a second 100 TB scan) and silently widens
  *    types from whatever the sampled files happened to contain. Every
  *    read here REQUIRES an explicit schema; the parser then prunes to
  *    exactly the requested fields while scanning.
  *  - **Quarantine, don't crash or drop.** Real crawls contain broken
  *    lines. PERMISSIVE mode + a corrupt-record column turns them into
  *    data (`readWithQuarantine`) so a pipeline can count, sample, and
  *    sink them instead of silently losing them (DROPMALFORMED) or
  *    dying mid-job (FAILFAST).
  *  - **Write splittable units.** One JSONL file per task, sized by
  *    upstream repartition — the writer never coalesces to 1 (a single
  *    100 TB file is unsplittable for every downstream reader).
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Write as JSON Lines. `partitions` > 0 repartitions first — size
    * output files for downstream parallelism (files are the read-side
    * split unit for JSONL). */
  def write(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").json(path)
  }

  /** Read with an explicit schema; malformed lines fail the job
    * (FAILFAST) — the right default for data you produced yourself,
    * where a bad line means a bug, not dirty input. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Read with an explicit schema, capturing malformed lines in
    * `_corrupt_record` instead of dropping them: well-formed rows have
    * it NULL, broken lines come back with every data field NULL and the
    * raw line preserved. Split the result on `isCorrupt` and sink the
    * quarantine side — at crawl scale "how many lines were broken this
    * batch" is a monitoring signal, not noise.
    *
    * Caveat (Spark contract): a query touching ONLY `_corrupt_record`
    * over a raw JSON scan is refused
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`) — keep at
    * least one data column in the projection, or cache the parsed
    * frame first. */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  def isCorrupt = col(CorruptCol).isNotNull
}
