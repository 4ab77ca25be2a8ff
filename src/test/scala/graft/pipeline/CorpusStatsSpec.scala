package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-level curation operators: exact substring-span dedup,
  * boilerplate line stripping, TF-IDF, vocabulary coverage, and int8
  * embedding quantization. Semantic checks on hand-built fixtures —
  * the DuckDB oracles (q_substring_dedup, q_line_dedup, q_tfidf_topterms,
  * q_vocab_coverage, q_embedding_quantize) hash-check the full dataflow.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicateSpanPairs finds exactly the docs sharing an 8-token run") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),       // shares 8-run with 2
      (2L, "z z a b c d e f g h"),       // overlap: "a b c d e f g h"
      (3L, "p q r s t u v w x y"),       // no shared runs
      (4L, "a b c d e f g q q q")        // only a 7-run with 1/2 — no hit
    ).toDF("id", "text")
    val pairs = CorpusStats.duplicateSpanPairs(docs, "id", "text",
      spanTokens = 8).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // doc1 grams: [a..h],[b..i],[c..j]; doc2 grams: [z z a..f],[z a..g],[a..h]
    assert(pairs.head.getLong(2) == 1L)
  }

  test("duplicateSpanPairs hashGrams variant returns the same pairs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x a b c d e f g h w"),
      (3L, "m n o p q r s t u v")
    ).toDF("id", "text")
    val plain = CorpusStats.duplicateSpanPairs(docs, "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashed = CorpusStats.duplicateSpanPairs(docs, "id", "text", 8,
      hashGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain == hashed && plain == Set((1L, 2L, 1L)))
  }

  test("duplicateSpanPairs caps pathological postings") {
    // 80 docs all sharing one 8-token span: df=80 > maxPostings=64 →
    // the span is boilerplate, no quadratic pair explosion
    val docs = (1 to 80).map(i => (i.toLong, s"a b c d e f g h tail$i"))
      .toDF("id", "text")
    assert(CorpusStats.duplicateSpanPairs(docs, "id", "text", 8).isEmpty)
  }

  test("crossCorpusSpanPairs: batch matches corpus via a persisted index") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "m n o p q r s t u v w x"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "z z a b c d e f g h"),   // shares one 8-run with corpus doc 1
      (11L, "nothing in common here at all right now"))
      .toDF("id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("spanidx").toString
    CorpusStats.writeSpanIndex(corpus, "id", "text", s"$tmp/idx")
    val idx = CorpusStats.readSpanIndex(spark, s"$tmp/idx")
    val out = CorpusStats.crossCorpusSpanPairs(idx, batch, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 10L, 1L)))
    // roundtripped posting index equals the directly-aggregated one
    // (sort lists: collect_list order is partitioning-dependent)
    import org.apache.spark.sql.functions.{col, sort_array}
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("gram"), sort_array(col("cids")).as("cids"))
    val direct = canon(CorpusStats.spanPostings(
      CorpusStats.spanGramTable(corpus, "id", "text")))
    assert(canon(idx).exceptAll(direct).isEmpty &&
      direct.exceptAll(canon(idx)).isEmpty)
  }

  test("stripBoilerplateLines drops high-df lines, keeps order, counts") {
    val docs = Seq(
      (1L, "HEADER\nbody one\nmore one\nFOOTER"),
      (2L, "HEADER\nbody two\nFOOTER"),
      (3L, "HEADER\nbody three\nFOOTER"),
      (4L, "HEADER\nbody four\nFOOTER"),
      (5L, "HEADER\nbody five\nFOOTER"))
      .toDF("id", "text")
    val out = CorpusStats.stripBoilerplateLines(docs, "id", "text",
      maxDocFrac = 0.5).orderBy("id").collect()
    assert(out.length == 5)
    val r1 = out.head
    assert(r1.getString(1) == "body one\nmore one")
    assert(r1.getLong(2) == 2L && r1.getLong(3) == 2L)
    assert(out(1).getString(1) == "body two")
  }

  test("stripBoilerplateLines keeps a fully-boilerplate doc with empty text") {
    val docs = Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME"), (4L, "unique line"))
      .toDF("id", "text")
    val out = CorpusStats.stripBoilerplateLines(docs, "id", "text", 0.5)
      .orderBy("id").collect()
    assert(out.length == 4)
    assert(out.take(3).forall(r => r.getString(1) == "" && r.getLong(2) == 0L))
    assert(out(3).getString(1) == "unique line")
  }

  test("stripBoilerplateLines keeps docs of only empty lines (empty output row)") {
    val docs = Seq(
      (1L, "\n\n"), (2L, ""), (3L, "real content line"))
      .toDF("id", "text")
    val out = CorpusStats.stripBoilerplateLines(docs, "id", "text", 0.9)
      .orderBy("id").collect()
    assert(out.length == 3, s"empty-line docs vanished: ${out.mkString(",")}")
    assert(out(0).getString(1) == "" && out(0).getLong(2) == 0L &&
      out(0).getLong(3) == 0L)
    assert(out(1).getString(1) == "")
    assert(out(2).getString(1) == "real content line")
  }

  test("dedupLinesWithinDoc drops intra-doc repeats, keeps first in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta\nalpha"),
      (2L, "only\nunique\nlines"))
      .toDF("id", "text")
    val out = CorpusStats.dedupLinesWithinDoc(docs, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "alpha\nbeta\ngamma")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 3L)
    assert(out(1).getString(1) == "only\nunique\nlines")
    assert(out(1).getLong(3) == 0L)
  }

  test("chunkDocuments: coverage, overlap, short-tail and tiny-doc cases") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b c")).toDF("id", "text")
    val out = CorpusStats.chunkDocuments(docs, "id", "text",
      chunkTokens = 32, overlap = 8).orderBy("id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 100 tokens, step 24: chunks start at 0,24,48,72 → ceil((100-32)/24)+1 = 4
    assert(d1.length == 4)
    assert(d1.take(3).forall(_.getInt(2) == 32))
    assert(d1.last.getInt(2) == 100 - 72) // short tail, not padded
    // overlap: chunk 1 starts at token 25 (w25); chunk 0 ends at w32
    assert(d1(1).getString(3).startsWith("w25 "))
    assert(d1(0).getString(3).endsWith(" w32"))
    // every token appears in some chunk
    val covered = d1.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"w$i").toSet)
    // doc smaller than one chunk → exactly one whole chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(3) == "a b c")
  }

  test("chunkDocuments with zero overlap reassembles the exact token stream") {
    val text = (1 to 97).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("id", "text")
    val chunks = CorpusStats.chunkDocuments(docs, "id", "text",
      chunkTokens = 16, overlap = 0).orderBy("chunk_id").collect()
    val reassembled = chunks.map(_.getString(3)).mkString(" ")
    assert(reassembled == text)
    assert(chunks.map(_.getInt(2)).sum == 97)
  }

  test("tfIdfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common rare3 rare3"))
      .toDF("id", "text")
    val out = CorpusStats.tfIdfTopTerms(docs, "id", "text", k = 2)
      .orderBy("id", "rank").collect()
    // 'common' has df=3=N → idf ln(1)=0; the doc-unique terms win rank 1
    assert(out.filter(_.getInt(1) == 1).map(_.getString(2)).toSeq ==
      Seq("rare1", "rare2", "rare3"))
    val rare3 = out.find(r => r.getLong(0) == 3L && r.getInt(1) == 1).get
    assert(math.abs(rare3.getDouble(3) - 2.0 * math.log(3.0)) < 1e-6)
    assert(out.filter(_.getString(2) == "common").forall(_.getDouble(3) == 0.0))
  }

  test("null text rows drop out of every corpus operator, never throw") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null)).toDF("id", "text")
    assert(CorpusStats.duplicateSpanPairs(docs, "id", "text").count() == 0)
    assert(CorpusStats.spanGramTable(docs, "id", "text").select("doc")
      .distinct().count() == 1)
    assert(CorpusStats.stripBoilerplateLines(docs, "id", "text").count() == 1)
    assert(CorpusStats.dedupLinesWithinDoc(docs, "id", "text").count() == 1)
    assert(CorpusStats.chunkDocuments(docs, "id", "text").count() == 1)
    assert(CorpusStats.tfIdfTopTerms(docs, "id", "text", 2)
      .select("id").distinct().count() == 1)
    assert(CorpusStats.vocabularyCoverage(docs, "text").count() == 8)
  }

  test("null rows through the round-5 operators: deterministic, never throw") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null)).toDF("id", "text")
    // perplexity: the null-text doc contributes no grams and gets no score
    val lm = TextAnalysis.charNgramLm(docs, "id", "text")
    assert(TextAnalysis.perplexityScores(docs, lm, "id", "text")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // bloom dedup: all null texts share one constant hash — at most the
    // min-id one survives, deterministically
    val corpus = Seq((10L, "corpus body one"), (11L, "corpus body two"))
      .toDF("id", "text")
    val bloom = Dedup.buildCorpusBloom(corpus, "text")
    val hashes = corpus.select(
      org.apache.spark.sql.functions.md5(col("text").cast("binary")).as("h"))
    val batch = Seq((1L, "fresh text"), (2L, null), (3L, null))
      .toDF("id", "text")
    val out = Dedup.exactDedupWithBloom(hashes, bloom, batch, "id", "text")
      .select("docId").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L), s"expected fresh + first null-text row, got $out")
    // semantic dedup: a null embedding pairs with nothing and keeps itself
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, null)).toDF("vec_id", "embedding")
    val sem = VectorOps.semanticDedup(vecs, "vec_id", "embedding",
        minCosine = 0.9, bits = 4, probes = 4,
        persistLevel = org.apache.spark.storage.StorageLevel.NONE)
      .select("id", "group_id", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(sem == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)), sem)
  }

  test("maskPii masks each PII kind with its placeholder, ordered safely") {
    val docs = Seq((1L,
      "mail bob.smith+x@corp.example.com call +1 555 0117 " +
        "from 192.168.1.254 acct 123456789012 normal text 42 stays"))
      .toDF("id", "text")
    val out = docs.select(TextAnalysis.maskPii(col("text"))).head.getString(0)
    assert(out == "mail <EMAIL> call <PHONE> from <IP> acct <ID> " +
      "normal text 42 stays", out)
    // email digits must not be phone-masked; short numbers untouched
    assert(!out.contains("555") && out.contains("42"))
  }

  test("vocabularyCoverage ranks by count and accumulates to 1") {
    val docs = Seq((1L, "a a a b b c")).toDF("id", "text")
    val out = CorpusStats.vocabularyCoverage(docs, "text", k = 10)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
    assert(math.abs(out.last.getDouble(3) - 1.0) < 1e-9)
    val shares = out.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (x, y) => x <= y })
  }

  test("quantizeInt8Stats: error bounded by half a step; constant dim exact") {
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 1.0f)),
      (2L, Array(10.0f, 5.0f, 2.0f)),
      (3L, Array(2.5f, 5.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8Stats(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out.length == 3)
    // max per-dim error = step/2 = (max-min)/255/2; dims span 10, 0, 2
    val maxRmse = (10.0 / 255 / 2) // worst dim bounds the rmse from above
    assert(out.forall(_.getDouble(2) <= maxRmse + 1e-9))
    // endpoints land exactly on codes 0/255 → vec1 dim1=min, vec2 dim1=max
    val v1 = out.head
    assert(v1.getLong(1) == 0L + 0L + 0L) // all three dims at their minimum
  }

  test("quantizeInt8Stats roundtrips exactly at the 0/255 endpoints") {
    val vecs = Seq(
      (1L, Array(0.0f, -1.0f)),
      (2L, Array(255.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8Stats(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    // both vectors sit exactly on min/max per dim → zero reconstruction error
    assert(out.forall(_.getDouble(2) == 0.0))
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 510L))
  }

  test("perplexityScores: closed-form smoothing, unseen grams, ranking") {
    import spark.implicits._
    // LM trained on "aaaa" alone: grams {aaa: 2} → N=2, V=1
    val lm = TextAnalysis.charNgramLm(
      Seq((0L, "aaaa")).toDF("doc_id", "text"), "doc_id", "text")
    assert(lm.as[(String, Long)].collect().toMap == Map("aaa" -> 2L))
    // score "aaab": grams aaa, aab → nlp = -(ln(3/3) + ln(1/3))/2
    val scored = TextAnalysis.perplexityScores(
        Seq((1L, "aaab")).toDF("doc_id", "text"), lm, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
    val expect = BigDecimal(-(math.log(3.0 / 3.0) + math.log(1.0 / 3.0)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored.toSeq == Seq((1L, 2L, expect,
      BigDecimal(math.exp(expect))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // curation contract: under an English-ish LM, LM-like text scores
    // lower perplexity than byte soup
    val train = (0L until 20L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val lm2 = TextAnalysis.charNgramLm(train, "doc_id", "text")
    val r = TextAnalysis.perplexityScores(
        Seq((100L, "the quick brown dog jumps over the lazy fox"),
            (101L, "zq9#kx@v7!mw2$pj8&gh4*")).toDF("doc_id", "text"),
        lm2, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(r(100L) < r(101L),
      s"LM-like text should score lower perplexity: $r")
  }
}
