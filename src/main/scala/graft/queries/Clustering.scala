package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{ConstantSimilarity, LevenshteinSimilarity}
import graft.er.{Analysis, ERState, Sampler, SinglePartition}
import graft.er.model._

/** Clustering-evaluation and posterior-summary operators (SURVEY §2:
  * A2-A10, J1/J2, G1/G2, F4/F9) exercised through the graft.er.Analysis
  * library against memberships derived from the TPC-H-ish tables, so the
  * DuckDB oracle can check the exact math. Plus the end-to-end MCMC
  * pipeline as a bounded-size rows-only query.
  */
object Clustering {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Two deterministic synthetic clusterings of orders (coarse/fine). */
  private def memberships(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders")
    val pred = o.select(col("o_orderkey").as("recordId"),
      (col("o_custkey") % 500).as("clusterId"))
    val truth = o.select(col("o_orderkey").as("recordId"),
      (col("o_custkey") % 997).as("clusterId"))
    (pred, truth)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J2+A8: contingency table of two clusterings.
    "q_contingency_table" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val pred = o.select(col("o_orderkey").as("recordId"),
        (col("o_custkey") % 20).as("clusterId"))
      val truth = o.select(col("o_orderkey").as("recordId"),
        (col("o_custkey") % 7).as("clusterId"))
      Analysis.contingencyTable(pred, truth, "recordId", "clusterId")
        .orderBy("predId", "trueId")
    }),

    // J1-equivalent pairwise metrics via contingency sums (A9/A10/F4).
    "q_pairwise_metrics" -> ((s, dir) => {
      val (pred, truth) = memberships(s, dir)
      Analysis.pairwiseMetrics(pred, truth, "recordId", "clusterId")
    }),

    // A9: adjusted Rand index.
    "q_adjusted_rand_index" -> ((s, dir) => {
      val (pred, truth) = memberships(s, dir)
      Analysis.adjustedRandIndex(pred, truth, "recordId", "clusterId")
    }),

    // A2/A3-shape: per-key modal category via one hash agg (max_by), then
    // regroup — the SMPC dataflow shape on relational data.
    "q_modal_assignment" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("n"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_type").as("modal_type"),
          col("m.n").as("n"))
        .groupBy(col("modal_type"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("modal_type")
    }),

    // A13 via the library: exact-match dedup baseline, size histogram.
    "q_exact_match_baseline" -> ((s, dir) => {
      Analysis.exactMatchClusters(t(s, dir, "part"), "p_partkey",
        Seq("p_brand", "p_type", "p_size"))
        .select(size(col("cluster")).as("clust_size"))
        .groupBy(col("clust_size")).agg(count(lit(1)).as("n"))
        .orderBy("clust_size")
    }),

    // G4/A13 via the library: near-match (all-but-one column) groups.
    "q_near_match_baseline" -> ((s, dir) => {
      val near = Analysis.nearMatchMembership(t(s, dir, "part"), "p_partkey",
        Seq("p_brand", "p_type", "p_size"), slack = 1)
      near.groupBy(col("clusterId")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("n") >= 5, 1)).as("n_big_groups"))
    }),

    // Sorted-neighborhood blocking + Jaro-Winkler linkage: rank parts by
    // name (scalable global rank — range repartition + per-partition
    // windows + broadcast offsets, NO single-partition sort), candidate
    // pairs within w=5 ranks via an O(n·w) equi-join on rank, then the
    // codegen jaro_winkler comparator keeps near-identical names.
    "q_blocking_sorted_neighborhood" -> ((s, dir) => {
      val p = t(s, dir, "part")
      graft.er.Blocking.sortedNeighborhoodPairs(p, "p_partkey", "p_name", w = 5)
        .select(col("id_a"), col("id_b"),
          round(graft.functions.JaroWinkler.jaro_winkler(
            col("key_a"), col("key_b")) + lit(1e-9), 6).as("jw"))
        .filter(col("jw") >= 0.9)
        .orderBy("id_a", "id_b")
    }),

    // SymSpell deletion-neighborhood fuzzy self-join on customer names:
    // lossless edit-distance-1 candidate generation via an equi-join on
    // single-deletion keys (O(n·|w|) keys, never the quadratic value
    // space), exact codegen'd Levenshtein verify on collisions only.
    "q_fuzzy_join_symspell" -> ((s, dir) => {
      graft.er.Blocking.symspellPairs(
          t(s, dir, "customer").select(col("c_name")), "c_name")
        .orderBy("a", "b")
    }),

    // End-to-end Bayesian ER. MCMC is not SQL-expressible, but the
    // fixed-seed chain is DETERMINISTIC, so the gate pins its
    // evaluation as oracle-checkable content: structural counts the
    // oracle recomputes from `customer`, plus floor booleans on the
    // pairwise precision/recall/F1 and ARI vs the planted truth
    // (reference semantics ProjectStep.scala:67-124). Two dup kinds are
    // planted — EXACT copies (custkey%10=0; the sampler links ~all of
    // them: measured p=1.0) and 1-char-distorted names (custkey%10=5;
    // the hard path — partially linked), giving measured
    // p=1.0 / r≈.51 / f1≈.67 / ari≈.67 at every SF; floors sit 10-20%
    // under the measured values so only a real sampler regression
    // trips them. Bounded input (≤300 base records) keeps the cost
    // scale-factor-independent.
    "q_er_pipeline" -> ((s, dir) => erPipeline(s, dir))
  )

  private def erPipeline(s: SparkSession, dir: String): DataFrame = {
    // custkeys are contiguous from 1, so a key filter bounds the input
    // to the same 300 records a sort+limit would — without the global
    // sort shuffle (and the filter pushes down into the scan)
    val base = t(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").cast("string").as("rid"),
        upper(substring(col("c_name"), -8, 8)).as("name"),
        col("c_nationkey").cast("string").as("nation"),
        col("c_mktsegment").as("segment"))

    // planted duplicates, two difficulties: every 10th record copied
    // EXACTLY, every (10k+5)th with the name's 3rd character cycled (a
    // deterministic single-field distortion)
    val exactDups = base.filter(col("rid").cast("long") % 10 === 0)
      .select(concat(col("rid"), lit("-dup")).as("rid"),
        col("name"), col("nation"), col("segment"))
    val distortedDups = base.filter(col("rid").cast("long") % 10 === 5)
      .select(concat(col("rid"), lit("-dup")).as("rid"),
        concat(substring(col("name"), 1, 2), lit("X"),
          substring(col("name"), 4, 100)).as("name"),
        col("nation"), col("segment"))
    // persist: downstream (stats pass, per-attribute dictionary builds,
    // encode, truth join) would otherwise re-run the filtered customer
    // scan once per job
    val records = base.unionAll(exactDups).unionAll(distortedDups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val prior = BetaParams(0.5, 50.0)
    val specs = Seq(
      AttributeSpec("name", LevenshteinSimilarity(7.0, 10.0), prior),
      AttributeSpec("nation", ConstantSimilarity, prior),
      AttributeSpec("segment", ConstantSimilarity, prior))

    val init = ERState.initialize(s, records, "rid", None, specs,
      _ => SinglePartition, seed = 42L)
    // blocked sweeps: 4 sweeps per shuffle/action — 4 Spark jobs for the
    // whole chain instead of 16
    val result = Sampler.run(init, numSweeps = 16, burnIn = 4, thin = 4,
      sweepsPerJob = 4)

    // the sampler already knows how many samples it recorded (one
    // diagnostics row each) — pass the count so SMPC skips its counting
    // pass over the chain
    val smpc = Analysis.sharedMostProbableClusters(result.chain.get,
      result.diagnostics.size.toDouble)
    val pred = Analysis.membershipFromClusters(smpc.select("records"), "records")
    // planted truth: rid with and without the "-dup" suffix share an entity
    val truth = records.select(col("rid").as("recordId"),
      regexp_replace(col("rid"), "-dup$", "").as("clusterId"))
    // fused precision/recall/F1/ARI: one pred×truth join + one CUBE
    // aggregation instead of the two separate metric plans (pred is
    // consumed once, so it no longer needs its own persist)
    val pmAri = Analysis.clusteringMetrics(pred, truth, "recordId", "clusterId")
    val counts = records.agg(count(lit(1)).as("n_records"),
      sum(col("rid").endsWith("-dup").cast("long")).as("n_truth_pairs"))
    // DETERMINISM ASSUMPTION: the oracle pins all four flags to 1, so
    // this gate is green iff the fixed-seed chain clears every floor on
    // the driver's box too. That is safe because the sweep is a pure
    // function of (seed, iteration, logical partition) and ERState
    // canonicalizes record order at init — core count and input
    // partitioning cannot change the SMPC (asserted by the
    // "same-seed runs agree across input physical layouts" e2e spec).
    // Floors sit well under the measured fixed-seed values
    // (precision 1.0, recall ~0.51, f1 ~0.68, ari ~0.67) so they gate
    // quality, not last-ulp luck; recall carries the widest margin
    // because it is the noisiest of the four under resampling.
    pmAri.crossJoin(counts).select(
      col("n_records"), col("n_truth_pairs"),
      (col("precision") >= 0.95).cast("long").as("precision_ok"),
      (col("recall") >= 0.40).cast("long").as("recall_ok"),
      (col("f1") >= 0.6).cast("long").as("f1_ok"),
      (col("ari") >= 0.6).cast("long").as("ari_ok"))
  }

  val oracles: Map[String, String] = Map(
    "q_contingency_table" ->
      """SELECT o_custkey % 20 AS predId, o_custkey % 7 AS trueId,
        |  count(*) AS n
        |FROM orders GROUP BY predId, trueId ORDER BY predId, trueId""".stripMargin,

    "q_pairwise_metrics" ->
      """WITH m AS (SELECT o_orderkey, o_custkey % 500 AS p,
        |             o_custkey % 997 AS t FROM orders),
        |cell AS (SELECT sum(n*(n-1)/2.0) AS tp FROM
        |  (SELECT p, t, count(*) AS n FROM m GROUP BY p, t)),
        |pp AS (SELECT sum(n*(n-1)/2.0) AS pred_pairs FROM
        |  (SELECT p, count(*) AS n FROM m GROUP BY p)),
        |tt AS (SELECT sum(n*(n-1)/2.0) AS true_pairs FROM
        |  (SELECT t, count(*) AS n FROM m GROUP BY t))
        |SELECT round(tp / pred_pairs, 6) AS precision,
        |  round(tp / true_pairs, 6) AS recall,
        |  round(2.0 * tp / (pred_pairs + true_pairs), 6) AS f1
        |FROM cell, pp, tt""".stripMargin,

    "q_adjusted_rand_index" ->
      """WITH m AS (SELECT o_orderkey, o_custkey % 500 AS p,
        |             o_custkey % 997 AS t FROM orders),
        |cell AS (SELECT sum(n*(n-1)/2.0) AS sum_cell FROM
        |  (SELECT p, t, count(*) AS n FROM m GROUP BY p, t)),
        |rs AS (SELECT sum(n*(n-1)/2.0) AS sum_row FROM
        |  (SELECT p, count(*) AS n FROM m GROUP BY p)),
        |cs AS (SELECT sum(n*(n-1)/2.0) AS sum_col FROM
        |  (SELECT t, count(*) AS n FROM m GROUP BY t)),
        |tot AS (SELECT count(*)*(count(*)-1)/2.0 AS total FROM m)
        |SELECT round((sum_cell - sum_row*sum_col/total) /
        |  ((sum_row + sum_col)/2.0 - sum_row*sum_col/total), 6) AS ari
        |FROM cell, rs, cs, tot""".stripMargin,

    "q_modal_assignment" ->
      """SELECT modal_type, count(*) AS n_users FROM (
        |  SELECT user_id, event_type AS modal_type, n,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type DESC) AS rn
        |  FROM (SELECT user_id, event_type, count(*) AS n FROM events
        |        GROUP BY user_id, event_type))
        |WHERE rn = 1 GROUP BY modal_type ORDER BY modal_type""".stripMargin,

    "q_exact_match_baseline" ->
      """SELECT clust_size, count(*) AS n FROM (
        |  SELECT count(*) AS clust_size FROM part
        |  GROUP BY p_brand, p_type, p_size)
        |GROUP BY clust_size ORDER BY clust_size""".stripMargin,

    "q_near_match_baseline" ->
      """WITH near AS (
        |  SELECT p_partkey, '0' || chr(1) || coalesce(CAST(p_brand AS VARCHAR), ' ')
        |    || chr(1) || coalesce(CAST(p_type AS VARCHAR), ' ') AS key FROM part
        |  UNION ALL
        |  SELECT p_partkey, '1' || chr(1) || coalesce(CAST(p_brand AS VARCHAR), ' ')
        |    || chr(1) || coalesce(CAST(p_size AS VARCHAR), ' ') FROM part
        |  UNION ALL
        |  SELECT p_partkey, '2' || chr(1) || coalesce(CAST(p_type AS VARCHAR), ' ')
        |    || chr(1) || coalesce(CAST(p_size AS VARCHAR), ' ') FROM part),
        |groups AS (SELECT key, count(*) AS n FROM near GROUP BY key
        |           HAVING count(*) >= 2)
        |SELECT count(*) AS n_groups,
        |  count(CASE WHEN n >= 5 THEN 1 END) AS n_big_groups
        |FROM groups""".stripMargin,

    // Fixed-seed MCMC evaluation pinned as data: the oracle recomputes
    // the structural counts from `customer` and expects every quality
    // floor to hold — a floor miss (sampler regression) or a count
    // drift (ingest regression) breaks the hash.
    "q_er_pipeline" ->
      """SELECT
        |  CAST(count(*) + sum(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_records,
        |  CAST(sum(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_truth_pairs,
        |  CAST(1 AS BIGINT) AS precision_ok,
        |  CAST(1 AS BIGINT) AS recall_ok,
        |  CAST(1 AS BIGINT) AS f1_ok,
        |  CAST(1 AS BIGINT) AS ari_ok
        |FROM customer WHERE c_custkey <= 300""".stripMargin,

    // brute-force ground truth: DuckDB can afford the quadratic join at
    // gate scale, so the oracle is the ALL-PAIRS answer — hash equality
    // proves the deletion-key blocking lossless, not just plausible
    "q_fuzzy_join_symspell" ->
      """WITH v AS (SELECT DISTINCT c_name AS w FROM customer
        |           WHERE c_name IS NOT NULL)
        |SELECT a.w AS a, b.w AS b,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 1
        |ORDER BY a, b""".stripMargin,

    "q_blocking_sorted_neighborhood" ->
      """WITH ranked AS (
        |  SELECT p_partkey AS id, p_name AS nm,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS r
        |  FROM part)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(jaro_winkler_similarity(a.nm, b.nm) + 1e-9, 6) AS jw
        |FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 5
        |WHERE round(jaro_winkler_similarity(a.nm, b.nm) + 1e-9, 6) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
  )
}
