package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage blocking: candidate-pair generation and blocking-scheme
  * evaluation (reduction ratio / pairs completeness) — the stage the
  * reference runs implicitly through its KD-tree partitioner
  * (partitioning/KDTreePartitioner.scala) before any within-partition
  * comparison. Re-expressed Spark-first: every step is a hash shuffle or
  * a range repartition; nothing materializes the quadratic pair space.
  */
object Blocking {

  /** Global dense rank by a total order WITHOUT a single-partition
    * window: range-repartition on the sort columns, rank locally per
    * partition (parallel windows), then shift by broadcast cumulative
    * partition offsets. The classic scalable global-ordering pattern —
    * at 1000 executors the only serial state is one row per partition.
    *
    * `orderCols` must be a total order (include a unique tie-break).
    * Output: input columns + `rank` (1-based, dense by construction).
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__local",
      row_number().over(Window.partitionBy(col("__pid"))
        .orderBy(orderCols: _*)))
    // one row per partition — broadcastable at any scale
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset")
  }

  /** Sorted-neighborhood blocking: order records by `key`, emit every
    * pair within a window of `w` ranks. Candidate generation is an
    * EQUI-join on rank (each record explodes to its w successor ranks),
    * so the shuffle is O(n·w) and never nested-loop. Returns
    * (id_a, key_a, id_b, key_b) with id_a's rank below id_b's.
    *
    * Hot-key audit: the join key is the GLOBAL rank, which is unique by
    * construction (globalRank's order includes the id tie-break and
    * assigns row_number), so the build side has exactly one row per key
    * and the probe side at most w (the ranks r-w..r-1 each emit r once)
    * — per-key fan-out is bounded by the window parameter, independent
    * of the data. No df cap or salting is needed here; skew cannot
    * arise. Spec-pinned in BlockingSpec ("join-key fan-out is bounded
    * by w").
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
      w: Int): DataFrame = {
    require(w >= 1, "window must be >= 1")
    val ranked = globalRank(df.select(col(idCol).as("__id"),
      col(keyCol).as("__key")), Seq(col("__key"), col("__id")))
    val probes = ranked.select(col("__id").as("id_a"),
        col("__key").as("key_a"),
        explode(sequence(col("rank") + 1, col("rank") + w)).as("rank"))
    probes.join(ranked.select(col("__id").as("id_b"),
        col("__key").as("key_b"), col("rank")), "rank")
      .select("id_a", "key_a", "id_b", "key_b")
  }

  /** Evaluate a blocking scheme against a ground-truth match set:
    * reduction ratio (how much of the quadratic pair space the blocks
    * prune) and pairs completeness (what fraction of true matches
    * survive blocking), both as `*_e6` integer micro-units.
    * Aggregation-only — candidate pairs are COUNTED per block
    * (c·(c-1)/2), never enumerated.
    *
    * `truth` must have columns (a, b) keyed like `idCol`.
    */
  def quality(corpus: DataFrame, idCol: String, blockKey: Column,
      truth: DataFrame, scheme: String): DataFrame = {
    val keyed = corpus.select(col(idCol).as("__id"), blockKey.as("__key"))
    val totals = keyed.agg(count(lit(1)).as("n")).select(col("n"),
      (col("n") * (col("n") - 1) / 2).cast("long").as("total_pairs"))
    val cand = keyed.groupBy("__key").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0L))
        .cast("long").as("cand_pairs"))
    val truthKeyed = truth
      .join(keyed.select(col("__id").as("a"), col("__key").as("ka")), "a")
      .join(keyed.select(col("__id").as("b"), col("__key").as("kb")), "b")
    val truthStats = truthKeyed.agg(count(lit(1)).as("true_pairs"),
      coalesce(sum(when(col("ka") === col("kb"), 1L).otherwise(0L)), lit(0L))
        .as("found_true"))
    totals.crossJoin(cand).crossJoin(truthStats)
      .select(lit(scheme).as("scheme"), col("n").as("n_docs"),
        col("total_pairs"), col("cand_pairs"),
        // ratios pinned to the 1e-6 grid as INTEGERS (explicit IEEE
        // multiply + scale-0 round) — decimal-scale round(x, n) drifts
        // across engine builds, integer outputs hash identically
        round((lit(1.0) - col("cand_pairs") / col("total_pairs")
          .cast("double")) * lit(1e6) + lit(1e-3)).cast("long")
          .as("reduction_ratio_e6"),
        col("true_pairs"), col("found_true"),
        round(col("found_true") / col("true_pairs").cast("double")
          * lit(1e6) + lit(1e-3)).cast("long").as("completeness_e6"))
  }

  /** SymSpell-style fuzzy self-join at edit distance ≤ 1 (Garbe's
    * deletion-neighborhood trick): every value emits itself plus its
    * |w| single-deletion variants as join keys; any pair within
    * Levenshtein distance 1 MUST share a key (an insertion's extra
    * character deleted on one side, a deletion's on the other, a
    * substitution's differing character on both), so an equi-join on
    * the key set is a LOSSLESS candidate generator and the exact
    * Levenshtein check only runs on collisions — never on the
    * quadratic value space. O(n·|w|) keys, hash-shuffled; the pair
    * verify is the codegen'd `levenshtein`.
    *
    * Hot-key posture: a deletion key's bucket holds the key's own value
    * plus its present single-insertions — bounded by 1 + (|k|+1)·|Σ|
    * in principle, but |Σ| is the live alphabet, so a short-token
    * vocabulary (every 2-char word containing 'a' shares key "a") or a
    * dense neighborhood puts thousands of values on one key, and the
    * keys×keys candidate stage then runs one |bucket|² straggler task.
    * Buckets past `maxBucket` are therefore SALTED, not capped — the
    * candidate set is exactly the unsalted one (lossless; dropping keys
    * would lose pairs): each hot key splits into g = ⌈bucket/maxBucket⌉
    * hash groups and the join runs per (key, groupA, groupB) composite,
    * so per-task join input is ≤ ~2·maxBucket rows and the |bucket|²
    * verify volume spreads over g² tasks. Replication cost is g× on the
    * hot keys only; cold keys (g = 1) pay one counting window. Worst-key
    * probe: `Test/runMain graft.er.SymSpellProbe` (numbers in
    * BASELINE.md).
    *
    * Returns (a, b, dist) with a < b, dist ≤ 1, a ≠ b — distance-0
    * pairs cannot occur because values are deduplicated first. */
  def symspellPairs(df: DataFrame, valueCol: String,
      maxBucket: Int = 4096): DataFrame = {
    require(maxBucket >= 1, "maxBucket must be >= 1")
    val v = df.select(col(valueCol).cast("string").as("w"))
      .filter(col("w").isNotNull).distinct()
    val keys = v.select(col("w"), explode(array_distinct(concat(
        array(col("w")),
        transform(sequence(lit(0), length(col("w")) - 1), i =>
          concat(col("w").substr(lit(1), i),
            col("w").substr(i + 2, length(col("w")))))))).as("key"))
    // per-key posting size -> salt-group count g (integer ceil; 1 = cold)
    val salted = keys
      .withColumn("__kc", count(lit(1)).over(Window.partitionBy(col("key"))))
      .withColumn("__g",
        floor((col("__kc") + lit(maxBucket - 1L)) / lit(maxBucket.toLong))
          .cast("int"))
      .withColumn("__s", pmod(xxhash64(col("w")), col("__g")).cast("int"))
    // two-sided skew split: a keeps its own group on the A axis and
    // replicates across the B axis, b the reverse — every (a, b) pair of
    // a key meets in EXACTLY one (key, sa, sb) composite, so multiplicity
    // (and thus the distinct) is unchanged from the unsalted join.
    val left = salted.select(col("key"), col("w").as("a"),
      col("__s").as("__sa"),
      explode(sequence(lit(0), col("__g") - 1)).as("__sb"))
    val right = salted.select(col("key"), col("w").as("b"),
      explode(sequence(lit(0), col("__g") - 1)).as("__sa"),
      col("__s").as("__sb"))
    left.join(right, Seq("key", "__sa", "__sb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
  }
}
