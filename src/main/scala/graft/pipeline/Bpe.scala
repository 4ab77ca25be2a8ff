package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the missing piece between the corpus and every
  * token-count/packing operator downstream: learn the merge table from
  * the data instead of assuming a tokenizer exists.
  *
  * Classic BPE training never touches the corpus per merge: it runs on
  * the WORD-FREQUENCY DICTIONARY (Sennrich's reference implementation
  * does exactly this), so after the single corpus tokenization pass the
  * per-merge cost is O(|vocab|), independent of corpus size. That is
  * the 100 TB shape here too:
  *
  *  - one corpus pass builds (word, freq) — a hash aggregate whose
  *    map-side combine shrinks the exploded token view to vocabulary
  *    size before the shuffle; the vocab table is persisted and is the
  *    ONLY distributed state the merge loop reads;
  *  - each merge round is (a) one narrow map deriving adjacent symbol
  *    pairs per word, (b) one integer hash-aggregate of
  *    (left, right) -> Σ freq (pair-type count, not corpus positions),
  *    (c) a 1-row argmax to the driver (the synchronization point every
  *    BPE trainer has — the merge decision is inherently global), and
  *    (d) one narrow map applying the merge. No shuffle ever carries
  *    more than the distinct-pair table.
  *
  * Determinism contract (what makes the loop oracle-replayable):
  *  - symbols are tracked as a separator-wrapped string (writing the
  *    U+001F separator as `#`): "he" is "#h##e#", so applying merge
  *    (l,r) is a plain non-overlapping left-to-right `replace` of
  *    "#l##r#" with "#lr#" — byte-for-byte the greedy BPE merge
  *    scan, because adjacent boundaries carry TWO separators (so
  *    consecutive matches never share characters) and `replace`
  *    resumes AFTER each substitution in both Spark and DuckDB:
  *    "aaaa" + (a,a) -> [aa, aa], never the overlapping [aa, a, a];
  *  - pair counts are exact integers; the winning pair is
  *    (max count, then lexicographically smallest left, then right) —
  *    a total order, so ties cannot diverge across engines;
  *  - only `[a-z0-9]+` tokens participate (no separator collisions,
  *    no engine-specific Unicode segmentation in scope).
  *
  * Reference scope note: cleanzr/dblink has no tokenizer; this is
  * beyond-reference surface for the LLM-pipeline family (token
  * counting is `q_doc_token_stats`; this learns the subword table that
  * real token budgets are denominated in).
  *
  * Real-tokenizer scale note: production vocabularies take 30k-100k
  * merges, where full per-round pair recounts waste work — the classic
  * refinement is INCREMENTAL pair-count maintenance (only words
  * containing the merged pair change their pair multiset; Sennrich's
  * trainer and SentencePiece both do this). The distributed analogue
  * keeps a persisted (pair -> count) table and applies per-round
  * deltas from the `contains(w, "#l##r#")` word subset — same
  * dataflow, one extra delta aggregate; the k=10 gate measures the
  * simple formulation.
  */
object Bpe {

  // US control char; the [a-z0-9]+ filter keeps it out of symbols.
  // Shared with the streaming expression compiler (DocStreams).
  private[graft] val S = "\u001f"

  /** (word, freq) dictionary of `[a-z0-9]+` whitespace tokens. */
  private def vocab(docs: DataFrame, textCol: String): DataFrame =
    graft.Tables.fanOut(docs)
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Separator-wrapped symbol string: each single-char symbol s becomes
    * "s"; merged symbols stay wrapped as one unit. */
  private def wrap(word: Column): Column =
    regexp_replace(word, "(.)", S + "$1" + S)

  /** Symbol array from the wrapped form. */
  private def syms(w: Column): Column =
    split(trim(w, S), S + S)

  /** One learned merge: rank (1-based), the two symbols joined, and the
    * exact pair count that won the round. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long)

  /** Result of [[learnMerges]]: the merge table (driver-side — k rows,
    * the model every BPE trainer ships) and the final per-word symbol
    * table `wordSymbols` (word, freq, n_syms) for downstream encoding. */
  final case class BpeModel(merges: Seq[Merge], wordSymbols: DataFrame)

  /** Learn `k` BPE merges over the corpus word dictionary. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): BpeModel = {
    require(k >= 1, "need at least one merge")
    // mode-aware cut, not persist: the returned wordSymbols plan stays
    // lazy over this frame, so a persist would pin a CacheManager entry
    // FOREVER (strong ref until an explicit unpersist nobody can
    // issue); LoopCheckpoint.cut is GC-reclaimed locally and durable
    // under the reliable-checkpoint session mode
    val v = graft.operators.LoopCheckpoint.cut(vocab(docs, textCol))
    var w = v.select(col("word"), col("freq"), wrap(col("word")).as("w"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (t <- 1 to k if !exhausted) {
      val s = w.select(col("freq"), syms(col("w")).as("s"))
        .filter(size(col("s")) > 1)
      val best = s.select(col("freq"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("l"),
            element_at(col("s"), i + 1).as("r")))).as("z"))
        .groupBy(col("z.l").as("l"), col("z.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(t, l, r, c)
        // merge application is a narrow map — the k-round chain over the
        // persisted vocab never shuffles
        w = w.withColumn("w",
          replace(col("w"), lit(S + l + S + S + r + S), lit(S + l + r + S)))
      }
    }
    BpeModel(merges.toSeq,
      w.select(col("word"), col("freq"),
        size(syms(col("w"))).as("n_syms")))
  }

  /** Per-document token statistics under a learned model: whitespace
    * word count (of the `[a-z0-9]+` words the model covers) and the
    * BPE token count after the model's merges. One tokenize pass plus
    * one join against the word-symbol table (vocabulary-sized — at
    * corpus scale this join broadcasts or shuffles vocab, never
    * re-deriving symbols per occurrence). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val occ = graft.Tables.fanOut(docs)
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    occ.join(model.wordSymbols.select(col("word"), col("n_syms")), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
  }
}
