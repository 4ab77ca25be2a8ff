package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard ≥ t) via prefix filtering —
  * the deterministic complement to MinHash LSH (pipeline/Dedup): LSH is
  * probabilistic candidate generation; this is LOSSLESS, returning
  * exactly the pairs a brute-force O(n²) scan would, without running one.
  *
  * Prefix-filter principle (Chaudhuri et al. SSJoin / Bayardo et al.
  * All-Pairs): order every record's token set by ascending global
  * document frequency (rarest first, ties by token). For Jaccard ≥ t a
  * pair (x, y) must share ≥ ceil(t·|x|) tokens, so any record can drop
  * its last ceil(t·|x|)−1 tokens and a matching pair still shares at
  * least one PREFIX token. Only records sharing a prefix token become
  * candidates; an exact intersection verifies each candidate once.
  *
  * Scale shape: token-df table (one agg), per-record sorted-token
  * rebuild (one agg), prefix-posting self-equi-join on the token
  * (shuffle on token — the rare-first ordering keeps postings short
  * exactly where frequency would explode them), distinct candidate
  * pairs, then a verify join against the token-array table. No step is
  * quadratic in records; the only fan-out is sum over prefix postings
  * of |posting|², bounded by putting the RAREST tokens in prefixes.
  */
object SetSimilarityJoin {

  /** Distinct lowercase whitespace tokens of a text column. */
  def tokenSet(textCol: Column): Column =
    filter(array_distinct(split(lower(trim(textCol)), "\\s+")),
      t => length(t) > 0)

  /** All pairs (a, b, inter, n_a, n_b, jaccard) with a < b and
    * Jaccard(tokens(a), tokens(b)) ≥ threshold. */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val toks = docs
      .select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)

    // Global document frequency per token: the total order that makes
    // prefixes rare-first. Ties break on the token string so the order
    // (and thus the candidate set) is fully deterministic.
    val df = toks.select(explode(col("__toks")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))

    // Rebuild each record's tokens sorted by (df, token): explode,
    // attach df, collect (df, token) structs, in-row sort. One shuffle
    // back to the record.
    val sorted = toks.select(col("__id"), explode(col("__toks")).as("__tok"))
      .join(df, "__tok")
      .groupBy("__id")
      .agg(transform(
        sort_array(collect_list(struct(col("__df"), col("__tok")))),
        s => s("__tok")).as("__toks"))
      .withColumn("__n", size(col("__toks")))

    // Prefix length |x| − ceil(t·|x|) + 1: drop tokens that cannot be
    // needed for any partner to reach the minimum overlap ceil(t·|x|).
    val prefix = sorted.select(col("__id"), col("__n"),
        explode(slice(col("__toks"), lit(1),
          (col("__n") - ceil(col("__n") * threshold) + 1).cast("int")))
          .as("__tok"))

    // Candidates: share a prefix token, canonical a < b, and pass the
    // size filter |b| ≤ |a| / t (Jaccard bounds partner sizes).
    val cand = prefix.as("l").join(prefix.as("r"),
        col("l.__tok") === col("r.__tok") &&
          col("l.__id") < col("r.__id") &&
          col("r.__n") * threshold <= col("l.__n") &&
          col("l.__n") * threshold <= col("r.__n"))
      .select(col("l.__id").as("a"), col("r.__id").as("b"))
      .distinct()

    // Verify each candidate exactly once against the full token sets.
    cand
      .join(sorted.select(col("__id").as("a"), col("__toks").as("__ta"),
        col("__n").as("n_a")), "a")
      .join(sorted.select(col("__id").as("b"), col("__toks").as("__tb"),
        col("__n").as("n_b")), "b")
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("n_a"), col("n_b"),
        col("jaccard"))
  }

  /** Brute-force reference: every pair, no filtering. Test-support
    * equality target for proving the prefix filter lossless. */
  def jaccardBruteForce(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    toks.as("l").join(toks.as("r"), col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("a"), col("r.__id").as("b"),
        size(array_intersect(col("l.__toks"), col("r.__toks"))).as("inter"),
        size(col("l.__toks")).as("n_a"), size(col("r.__toks")).as("n_b"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
  }
}
