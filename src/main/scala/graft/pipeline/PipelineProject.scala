package graft.pipeline

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven corpus curation — the pipeline counterpart of the
  * reference's config-driven ER entry point (`ERProject`): a JSON job
  * spec selects and parameterizes the stages, so a whole daily-ingest
  * pass runs from one file with no code. Stages (each optional, applied
  * in this order, each individually oracle-gated elsewhere):
  *
  *   read parquet → exact dedup against an existing corpus (bloom
  *   prefilter + anti-join) → strip corpus boilerplate lines → dedup
  *   lines within doc → mask PII → clean → language/quality filter →
  *   LM-perplexity outlier filter → dedup (exact | minhash | simhash) →
  *   per-group quality calibration → split label → write parquet
  *
  * Output schema: (id, text, lang, quality[, split]).
  */
object PipelineProject {

  final case class Conf(
      inputPath: String = "",
      idCol: String = "doc_id",
      textCol: String = "text",
      corpusPath: String = "", // "" = no against-corpus ingest prefilter
      corpusBloomFpp: Double = 0.01,
      maxPerplexity: Double = 0.0, // 0 = stage off
      stripBoilerplateMaxDocFrac: Double = 0.0, // 0 = stage off
      dedupLinesWithinDoc: Boolean = false,
      maskPii: Boolean = false,
      keepLangs: Seq[String] = Seq.empty, // empty = no language filter
      minQuality: Double = 0.0,
      dedup: String = "exact", // exact | minhash | simhash | none
      minhashThreshold: Double = 0.8,
      simhashMaxHamming: Int = 3,
      calibrateGroupCol: String = "", // "" = stage off
      calibrateKeepFrac: Double = 1.0,
      normalizeScoresByGroup: String = "", // "" = stage off
      minPctRank: Double = 0.0, // with normalize: keep pct_rank >= this
      splitTrainPct: Int = 0, // 0 = no split column
      splitValPct: Int = 0,
      outputPath: String = "") // "" = return only

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def parseConf(json: String): Conf = mapper.readValue(json, classOf[Conf])

  def loadConf(path: String): Conf =
    parseConf(Files.readString(Paths.get(path)))

  def run(spark: SparkSession, conf: Conf): DataFrame = {
    val docs = spark.read.parquet(conf.inputPath)
    runOn(docs, conf)
  }

  /** The stage chain on an already-loaded frame (tests / composition). */
  def runOn(docs: DataFrame, conf: Conf): DataFrame = {
    val id = conf.idCol
    val txt = conf.textCol

    var df = docs.select(col(id), col(txt))

    // incremental-ingest mode: drop batch rows whose RAW text already
    // exists in the corpus — bloom prefilter in front of the anti-join,
    // so only suspects touch the corpus hash table (see
    // Dedup.exactDedupWithBloom); runs before any text mutation so the
    // membership check matches what the corpus actually stored
    if (conf.corpusPath.nonEmpty) {
      val corpus = docs.sparkSession.read.parquet(conf.corpusPath)
      val bloom = Dedup.buildCorpusBloom(corpus, txt, conf.corpusBloomFpp)
      val hashes = corpus.select(md5(col(txt).cast("binary")).as("h"))
        .distinct()
      df = Dedup.exactDedupWithBloom(hashes, bloom, df, id, txt)
        .select(col("docId").as(id), col("text").as(txt))
    }

    if (conf.stripBoilerplateMaxDocFrac > 0)
      df = CorpusStats.stripBoilerplateLines(df, id, txt,
          conf.stripBoilerplateMaxDocFrac)
        .select(col(id), col("clean_text").as(txt))

    if (conf.dedupLinesWithinDoc)
      df = CorpusStats.dedupLinesWithinDoc(df, id, txt)
        .select(col(id), col("clean_text").as(txt))

    if (conf.maskPii)
      df = df.withColumn(txt, TextAnalysis.maskPii(col(txt)))

    // clean + score (always: downstream stages key on these columns)
    df = df.select(col(id), TextAnalysis.cleanText(col(txt)).as(txt))
      .withColumn("lang", TextAnalysis.detectLanguage(col(txt)))
      .withColumn("quality", TextAnalysis.qualityScore(col(txt)))

    if (conf.keepLangs.nonEmpty)
      df = df.filter(col("lang").isin(conf.keepLangs: _*))
    if (conf.minQuality > 0)
      df = df.filter(col("quality") >= conf.minQuality)

    // LM-perplexity outlier filter: score each doc under the surviving
    // corpus's own char-trigram LM and drop the high-perplexity tail
    // (byte soup / wrong-charset text the heuristic quality score can
    // miss). Self-trained LM = no external asset; at real scale train
    // once and reuse (the LM table is vocabulary-bounded).
    if (conf.maxPerplexity > 0) {
      val lm = TextAnalysis.charNgramLm(df, id, txt)
      val keep = TextAnalysis.perplexityScores(df, lm, id, txt)
        .filter(col("ppl") <= conf.maxPerplexity)
        .select(col(id))
      df = df.join(keep, Seq(id), "left_semi")
    }

    df = conf.dedup match {
      case "none" => df
      case "exact" =>
        // keep the min-id row of each identical-text group
        val keep = df.groupBy(md5(col(txt).cast("binary")).as("__h"))
          .agg(min(col(id)).as(id))
          .select(col(id))
        df.join(keep, Seq(id), "left_semi")
      case "minhash" | "simhash" =>
        val pairs =
          if (conf.dedup == "minhash")
            Dedup.nearDuplicatePairs(df, id, txt,
                threshold = conf.minhashThreshold,
                persistLevel = org.apache.spark.storage.StorageLevel.NONE)
              .select(col("a"), col("b"))
          else
            Dedup.simHashPairs(df, id, txt, conf.simhashMaxHamming)
              .select(col("a"), col("b"))
        // duplicate groups → keep each group's representative (min id,
        // = the component label); docs in no pair keep themselves
        val comps = graft.operators.ConnectedComponents.components(pairs)
        val drop = comps.filter(col("id") =!= col("comp"))
          .select(col("id").as(id))
        df.join(drop, Seq(id), "left_anti")
      case other =>
        throw new IllegalArgumentException(s"unknown dedup mode: $other")
    }

    if (conf.calibrateGroupCol.nonEmpty && conf.calibrateKeepFrac < 1.0)
      df = Curation.keepTopFraction(df, conf.calibrateGroupCol, "quality",
        conf.calibrateKeepFrac).drop("cutoff")

    // cross-group score comparability: per-group percentile ranks on the
    // quality score, with an optional ONE global threshold replacing
    // per-group tuning
    if (conf.normalizeScoresByGroup.nonEmpty) {
      df = Curation.percentileNormalize(df, conf.normalizeScoresByGroup,
        "quality")
      if (conf.minPctRank > 0.0)
        df = df.filter(col("pct_rank") >= conf.minPctRank)
    }

    if (conf.splitTrainPct > 0)
      df = df.withColumn("split",
        Sampling.split(col(id), conf.splitTrainPct, conf.splitValPct))

    if (conf.outputPath.nonEmpty)
      df.write.mode("overwrite").parquet(conf.outputPath)
    df
  }
}

/** CLI entry point:
  * spark-submit --class graft.pipeline.RunPipeline <jar> curation.json */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RunPipeline <curation.json>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
    // spark-submit supplies spark.master; fall back to local otherwise
    // so the same entry point runs under plain `sbt runMain`
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[$cpus]")).getOrCreate()
    try {
      val conf = PipelineProject.loadConf(args(0))
      val n = PipelineProject.run(spark, conf).count()
      println(s"[pipeline] ${conf.inputPath} -> " +
        s"${if (conf.outputPath.isEmpty) "(unwritten)" else conf.outputPath}" +
        s": $n surviving documents")
    } finally spark.stop()
  }
}
