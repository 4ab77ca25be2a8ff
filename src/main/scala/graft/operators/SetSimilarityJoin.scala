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
  * On top of plain prefix postings, the candidate join carries PPJoin's
  * two lossless prunes (Xiao et al., "Efficient Similarity Joins for
  * Near Duplicate Detection", WWW 2008):
  *
  *  - INDEX-PREFIX asymmetry: orient each pair so `l` is the smaller
  *    record (ties by id). The smaller side only needs its MIDDLE
  *    prefix |x| − ceil(2t/(1+t)·|x|) + 1 — strictly shorter than the
  *    probe prefix — because a match with any equal-or-larger partner
  *    must overlap by ≥ ceil(2t/(1+t)·|x|), which cannot fit entirely
  *    in the suffix. A hot template token at probe-prefix position i
  *    of B near-identical records enumerates B·B' pairs only where it
  *    ALSO falls inside the shorter index prefix — the worst-bucket
  *    join cost drops from |posting|² to |posting| × |index-posting|.
  *  - POSITIONAL filter: for a shared token at (1-based) positions
  *    (i, j), overlap is at most 1 + min(|x|−i, |y|−j); require that to
  *    reach the equivalent-overlap bound ceil(t/(1+t)·(|x|+|y|)). The
  *    FIRST shared token of a true match always passes, so the prune
  *    is lossless while late-prefix template collisions die in the
  *    join condition instead of surviving to distinct+verify.
  *
  * All ceil() thresholds are guarded with a −1e-6 epsilon on the
  * LENGTHEN-prefix / WEAKEN-filter side, so double rounding can only
  * admit an extra candidate (caught by verify), never drop a true one.
  *
  * Scale shape: token-df table (one agg), per-record sorted-token
  * rebuild (one agg), prefix-posting self-equi-join on the token
  * (shuffle on token — the rare-first ordering keeps postings short
  * exactly where frequency would explode them), distinct candidate
  * pairs, then a verify join against the token-array table. No step is
  * quadratic in records; posting fan-out is bounded by the index-prefix
  * asymmetry plus the positional prune above.
  */
object SetSimilarityJoin {

  /** Distinct lowercase whitespace tokens of a text column. */
  def tokenSet(textCol: Column): Column =
    filter(array_distinct(split(lower(trim(textCol)), "\\s+")),
      t => length(t) > 0)

  /** (__id, __toks, __n): each record's tokens sorted rare-first by
    * global document frequency (ties by token — fully deterministic),
    * built with one df aggregation and one collect-back shuffle. */
  def sortedTokens(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val df = toks.select(explode(col("__toks")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
    toks.select(col("__id"), explode(col("__toks")).as("__tok"))
      .join(df, "__tok")
      .groupBy("__id")
      .agg(transform(
        sort_array(collect_list(struct(col("__df"), col("__tok")))),
        s => s("__tok")).as("__toks"))
      .withColumn("__n", size(col("__toks")))
  }

  /** Distinct candidate pairs (a, b), a < b by id, that share a prefix
    * token AND survive the size, index-prefix, and positional prunes —
    * every true Jaccard ≥ threshold pair is guaranteed present. */
  def candidatePairs(sorted: DataFrame, threshold: Double): DataFrame = {
    val t = threshold
    // probe-prefix postings with the token's 1-based in-record position
    val posting = sorted.select(col("__id"), col("__n"),
        posexplode(slice(col("__toks"), lit(1),
          (col("__n") - ceil(col("__n") * t - 1e-6) + 1).cast("int"))))
      .select(col("__id"), col("__n"),
        (col("pos") + 1).as("__pos"), col("col").as("__tok"))
    val l = posting.as("l")
    val r = posting.as("r")
    // minimum overlap for Jaccard ≥ t at sizes (|l|, |r|)
    val minOverlap =
      ceil((col("l.__n") + col("r.__n")) * (t / (1 + t)) - 1e-6)
    // middle (index) prefix length of the smaller side
    val indexPrefixLen = col("l.__n") -
      ceil(col("l.__n") * (2 * t / (1 + t)) - 1e-6) + 1
    l.join(r,
        col("l.__tok") === col("r.__tok") &&
          // orient: l is the smaller record (ties by id) — each
          // unordered pair enumerates exactly once
          (col("l.__n") < col("r.__n") ||
            (col("l.__n") === col("r.__n") &&
              col("l.__id") < col("r.__id"))) &&
          // size filter: |l| ≥ t·|r| (the other direction is implied)
          col("l.__n") >= col("r.__n") * t - 1e-6 &&
          // index-prefix prune on the smaller side
          col("l.__pos") <= indexPrefixLen &&
          // positional overlap upper bound
          lit(1) + least(col("l.__n") - col("l.__pos"),
            col("r.__n") - col("r.__pos")) >= minOverlap)
      .select(least(col("l.__id"), col("r.__id")).as("a"),
        greatest(col("l.__id"), col("r.__id")).as("b"))
      .distinct()
  }

  /** All pairs (a, b, inter, n_a, n_b, jaccard) with a < b and
    * Jaccard(tokens(a), tokens(b)) ≥ threshold. */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val sorted = sortedTokens(docs, idCol, textCol)
    val cand = candidatePairs(sorted, threshold)
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
