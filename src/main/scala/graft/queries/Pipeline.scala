package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Dedup, Multimodal, TextAnalysis, VectorOps}

/** LLM-training-data pipeline operators over the documents/embeddings
  * tables: dedup family, text analysis, similarity search, multimodal
  * plumbing. SQL-expressible invariants get DuckDB oracles; hash-sketch
  * internals (minhash/simhash/xxhash-based) are rows-only by nature.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** documents ∪ deterministic mutated copies — planted near-duplicates
    * (id offset +100000, last 30 characters dropped). */
  private def docsWithPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val mutated = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(10))).as("text"))
    d.unionAll(mutated)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text statistics: token/punct counts (oracle-checked).
    "q_doc_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("n_chars"),
        length(col("text")).as("len"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.punctCount(col("text")).as("n_punct"))
        .orderBy("doc_id")
    }),

    // Exact-dedup hashing: md5 content hash per doc (oracle-checked —
    // proves byte-identical hashing across engines).
    "q_doc_content_hash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
        .orderBy("doc_id")
    }),

    // Full text-analysis profile: quality score, language id,
    // fingerprint (rows-only: heuristic + xxhash internals).
    "q_doc_profile" -> ((s, dir) =>
      TextAnalysis.profile(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // MinHash+LSH near-dup detection on planted duplicates (rows-only).
    // Emits one row per surviving near-dup pair.
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      val docs = docsWithPlantedDups(s, dir)
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
        .orderBy("a", "b")
    }),

    // SimHash near-dup detection on the same planted corpus (rows-only).
    "q_dedup_simhash" -> ((s, dir) => {
      val docs = docsWithPlantedDups(s, dir)
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6)
        .orderBy("a", "b")
    }),

    // n-gram Jaccard between consecutive doc pairs (oracle-checked: pure
    // set algebra over character 3-grams).
    "q_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 50)
      val pairs = d.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .filter(col("b") < 50)
      Dedup.charNgramJaccard(t(s, dir, "documents"), pairs, "doc_id", "text")
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    }),

    // Embedding norms (oracle-checked; double-promoted on both sides).
    "q_vector_norms" -> ((s, dir) => {
      t(s, dir, "embeddings").select(col("vec_id"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0d), (acc, v) => acc + v)), 4).as("norm"))
        .orderBy("vec_id")
    }),

    // Per-label embedding stats (oracle-checked).
    "q_embedding_label_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"),
          aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0d), (acc, v) => acc + v).as("sq"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(sqrt(col("sq"))), 4).as("avg_norm"))
        .orderBy("label")
    }),

    // Brute-force exact cosine top-k (rows-only: rank boundaries are
    // float-sensitive across engines).
    "q_ann_bruteforce_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 5)
      VectorOps.bruteForceTopK(emb, queriesDf, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("rank"), col("cid"), col("cosine"))
        .orderBy("qid", "rank")
    }),

    // LSH-bucketed ANN pairs — the 100TB scale path (rows-only). The
    // corpus gets planted near-duplicates (slightly perturbed copies) so
    // recall is observable: every planted pair has cosine ≈ 1 and must
    // land in the same hyperplane bucket.
    "q_ann_lsh_pairs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0f) + when(i % 7 === 0, 0.02f).otherwise(0.0f)))
            .as("embedding"))
      VectorOps.lshNeighborPairs(emb.unionAll(planted), "vec_id", "embedding",
        bits = 10, minCosine = 0.9, probes = 2)
        .orderBy("a", "b")
    }),

    // Multimodal plumbing: binary payloads through batch feature
    // extraction + frame sampling; byte-length and frame-count invariants
    // are oracle-checked, the stubbed decode features are not.
    "q_multimodal_pipeline" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("mediaId"), col("byteLen"))
      val frames = Multimodal.sampleFrames(media, n = 4).toDF()
        .groupBy(col("mediaId")).agg(count(lit(1)).as("n_frames"))
      feats.join(frames, Seq("mediaId"), "left")
        .select(col("mediaId"),
          col("byteLen"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"))
        .orderBy("mediaId")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_doc_token_stats" ->
      """SELECT doc_id, n_chars, length(text) AS len,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
        |  END AS n_tokens,
        |  CAST(length(text) -
        |    length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS INTEGER)
        |    AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_doc_content_hash" ->
      """SELECT doc_id, md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH grams AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, length(text) - 1), i -> substr(text, i, 3))) AS g
        |  FROM documents),
        |pairs AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents
        |          WHERE doc_id < 49)
        |SELECT a, b, round(
        |  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) /
        |  len(list_distinct(list_concat(ga.g, gb.g))), 6) AS jaccard
        |FROM pairs JOIN grams ga ON pairs.a = ga.doc_id
        |           JOIN grams gb ON pairs.b = gb.doc_id
        |ORDER BY a, b""".stripMargin,

    "q_vector_norms" ->
      """SELECT vec_id, round(sqrt(list_sum(list_transform(embedding,
        |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_embedding_label_stats" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q_multimodal_pipeline" ->
      """SELECT doc_id AS mediaId, CAST(strlen(text) AS INTEGER) AS byteLen,
        |  CASE WHEN strlen(text) = 0 THEN 0
        |       ELSE CAST(4 AS BIGINT) END AS n_frames
        |FROM documents ORDER BY mediaId""".stripMargin
  )
}
