package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The config-driven curation runner: JSON spec → stage chain. */
class PipelineProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val enText =
    "the quick brown fox jumps over it and that is all for the day now"

  test("JSON conf parses with defaults for omitted fields") {
    val c = PipelineProject.parseConf(
      """{"inputPath": "/x", "keepLangs": ["en"], "dedup": "minhash",
        |"splitTrainPct": 80, "splitValPct": 10}""".stripMargin)
    assert(c.inputPath == "/x" && c.keepLangs == Seq("en"))
    assert(c.dedup == "minhash" && c.minhashThreshold == 0.8)
    assert(c.splitTrainPct == 80 && c.idCol == "doc_id")
  }

  test("stage chain: lines, pii, lang/quality, exact dedup, split") {
    val docs = Seq(
      (1L, s"HEADER\n$enText call +1 555 0101\nHEADER"),
      (2L, s"HEADER\n$enText call +1 555 0101\nHEADER"), // dup of 1 post-mask
      (3L, "HEADER\nder hund ist in den garten und die katze auch da\nHEADER"),
      (4L, "HEADER\nx\nHEADER"))
      .toDF("doc_id", "text")
    val conf = PipelineProject.Conf(
      stripBoilerplateMaxDocFrac = 0.9, // HEADER df=4/4 > 0.9 → stripped
      maskPii = true,
      keepLangs = Seq("en"),
      minQuality = 0.3,
      dedup = "exact",
      splitTrainPct = 80, splitValPct = 10)
    val out = PipelineProject.runOn(docs, conf)
    val rows = out.select("doc_id", "text", "lang", "split")
      .as[(Long, String, String, String)].collect()
    // doc 3 is German, doc 4 too short/low quality, doc 2 an exact dup
    assert(rows.map(_._1).toSeq == Seq(1L))
    val r = rows.head
    assert(r._2.contains("<PHONE>") && !r._2.contains("HEADER"))
    assert(r._3 == "en" && Set("train", "val", "test").contains(r._4))
  }

  test("percentile-normalize stage ranks within group and applies one threshold") {
    import org.apache.spark.sql.functions.col
    // four English docs with strictly increasing quality (longer, less
    // repetitive text scores higher); top half must survive pct >= 0.5
    val docs = (1L to 4L).map { i =>
      (i, (s"$enText unique segment number $i " * i.toInt).trim)
    }.toDF("doc_id", "text")
    val out = PipelineProject.runOn(docs, PipelineProject.Conf(
      dedup = "none", normalizeScoresByGroup = "lang", minPctRank = 0.5))
    val ranks = out.select("doc_id", "pct_rank")
      .as[(Long, Double)].collect().toMap
    assert(ranks.values.forall(p => p >= 0.5 && p <= 1.0), ranks)
    assert(ranks.size < 4 && ranks.nonEmpty, ranks)
    // no threshold: every doc keeps a rank in [0, 1]
    val all = PipelineProject.runOn(docs, PipelineProject.Conf(
      dedup = "none", normalizeScoresByGroup = "lang"))
      .select("pct_rank").as[Double].collect()
    assert(all.length == 4 && all.min == 0.0 && all.max == 1.0)
  }

  test("against-corpus bloom prefilter and perplexity filter stages") {
    val corpusDir = java.nio.file.Files
      .createTempDirectory("ppcorpus").toString
    (0L until 50L).map(i => (i, s"$enText corpus entry number $i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir)
    // enough English mass that the self-trained LM separates byte soup
    val docs = (Seq(
      (100L, s"$enText corpus entry number 7"))  // already in corpus → drop
      ++ (101L to 120L).map(i => (i, s"$enText fresh arrival number $i"))
      ++ Seq((200L, "zq9#kx@v7!mw2äßþ jfjfjfjf qqqq zzzz xxxx " +
        "vvvv bbbb nnnn mmmm kkkk")))              // byte soup → ppl outlier
      .toDF("doc_id", "text")
    val out = PipelineProject.runOn(docs, PipelineProject.Conf(
      corpusPath = corpusDir,
      maxPerplexity = 200.0,
      dedup = "none"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(100L), "corpus duplicate survived the bloom stage")
    assert((101L to 120L).forall(kept.contains), s"fresh docs dropped: $kept")
    assert(!kept.contains(200L), s"byte soup survived the perplexity filter")
  }

  test("near-dup dedup keeps one representative per duplicate group") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (1L, base), (2L, base + " tail"), // near-dups of each other
      (3L, "completely different content with other words entirely here"))
      .toDF("doc_id", "text")
    val out = PipelineProject.runOn(docs,
      PipelineProject.Conf(dedup = "minhash", minhashThreshold = 0.7))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept $kept")
  }
}
