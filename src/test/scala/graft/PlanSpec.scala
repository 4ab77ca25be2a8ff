package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these queries
  * scale (scan pushdown, column pruning, broadcast joins, partial
  * aggregation) must survive refactors. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    // FormattedMode prints untruncated PushedFilters/ReadSchema sections
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("BandedRangeJoinRule: interval join loses its nested-loop plan, keeps its answer") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"))
    val wins = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("w_user"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    def naive() = clicks.join(wins,
      col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("event_id"), col("w_user"))
    // baseline: rule off → nested-loop plan, reference answer
    spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "0")
    spark.experimental.extraOptimizations = Seq(graft.plans.BandedRangeJoinRule)
    val before = naive()
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = before.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    try {
      spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "3600000000")
      val rewritten = naive()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
      assert(!plan.contains("CartesianProduct"), plan.take(3000))
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq, "rewritten join changed the answer")
      assert(got.nonEmpty)
      // idempotence/scope: an equi-keyed join is left alone
      val equi = clicks.join(ev.select(col("event_id").as("e2")),
        col("event_id") === col("e2"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      // TIMESTAMP_NTZ arm: the no-timezone parquet flavor must get the
      // SAME rewrite (a silently-skipped rule leaves the quadratic
      // nested-loop plan in place while still returning correct rows)
      import org.apache.spark.sql.types.TimestampNTZType
      val clicksN = clicks.withColumn("ts", col("ts").cast(TimestampNTZType))
      val winsN = wins
        .withColumn("w_start", col("w_start").cast(TimestampNTZType))
        .withColumn("w_end", col("w_end").cast(TimestampNTZType))
      val ntz = clicksN.join(winsN,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .select(col("event_id"), col("w_user"))
      val ntzPlan = ntz.queryExecution.executedPlan.toString
      assert(!ntzPlan.contains("BroadcastNestedLoopJoin"), ntzPlan.take(3000))
      val gotN = ntz.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(gotN.toSeq == expected.toSeq, "NTZ rewrite changed the answer")
    } finally {
      spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "0")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("overlap-join rewrite: double-banded equi-join replaces the nested loop") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events").filter(col("user_id") < 30)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), unix_micros(col("ts")).as("vs"),
        (unix_micros(col("ts")) + 600000000L).as("ve"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), unix_micros(col("ts")).as("ps"),
        (unix_micros(col("ts")) + 300000000L).as("pe"))
    def naive() = v.join(p, col("vs") < col("pe") && col("ps") < col("ve"))
      .select(col("vid"), col("pid"))
    spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "0")
    spark.experimental.extraOptimizations = Seq(graft.plans.BandedRangeJoinRule)
    val before = naive()
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = before.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    try {
      spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "600000000")
      val rewritten = naive()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
      assert(plan.contains("__graft_oband"), "overlap banding must fire")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq,
        "overlap rewrite changed the answer (dedupe or banding bug)")
      // the containment pattern must still route to the ORIGINAL arm,
      // not the overlap one
      val clicks = Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val wins = Tables.load(spark, dir, "events")
        .filter(col("event_type") === "signup")
        .select(col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      val cont = clicks.join(wins,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      val contPlan = cont.queryExecution.optimizedPlan.toString
      assert(contPlan.contains("__graft_band") &&
        !contPlan.contains("__graft_oband"), contPlan.take(2000))
    } finally {
      spark.conf.set(graft.plans.BandedRangeJoinRule.ConfKey, "0")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("runtime bloom-filter join: filter injected on the fact side, answer unchanged") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val ords = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
    def joined() = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    val baseline = joined().collect().toSet
    graft.operators.RuntimeFilter.withRuntimeBloom(spark) {
      val df = joined()
      val got = df.collect().toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$plan")
      assert(got == baseline,
        "runtime-filtered join changed the answer")
    }
    // and the gate query itself executes under the filter (eager
    // checkpoint inside the conf window) with the same result set
    val gate = SparkEntry.queries("q_runtime_bloom_join")(spark, dir)
    assert(gate.collect().toSet == baseline)
  }

  test("dynamic partition pruning: fact scan carries a dynamicpruning partition filter") {
    val df = SparkEntry.queries("q_partition_prune_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("bucketed join: co-located, no exchange under the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_bucketed_join")(spark, dir)
      df.collect()
      // AQE prints Final + Initial sections; count exchanges in the
      // FINAL plan only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      // without bucketing this plan has 4 exchanges (both join inputs +
      // agg + orderBy); bucketed scans leave only the post-join two
      val exchanges = "Exchange (hash|range)partitioning".r
        .findAllIn(plan).size
      assert(exchanges <= 2,
        s"join inputs shuffled despite bucketing ($exchanges exchanges):\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan not bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("filters and projection push into the parquet scan") {
    val plan = planOf("q_scan_filter_project")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"), plan.take(2000))
    assert(plan.contains("EqualTo(l_returnflag,R)"))
    // column pruning: only the 5 referenced columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_returnflag:string>"))
  }

  test("dimension joins broadcast") {
    val plan = planOf("q_join_broadcast_dims")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("grouped aggregation is partial (map-side combine)") {
    val plan = planOf("q_agg_pricing_summary")
    // two HashAggregates around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("Exchange"))
  }

  test("top-1-per-key runs as a pure hash aggregation, no sort fallback") {
    // the packed-long argmax encoding exists precisely so this never
    // degrades to SortAggregate (struct max buffers aren't hash-mutable)
    val plan = planOf("q_top1_per_key")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
  }

  test("semi and anti joins plan as join types, not subquery rewrites") {
    assert(planOf("q_join_semi").contains("LeftSemi"))
    assert(planOf("q_join_anti").contains("LeftAnti"))
  }

  test("banded range join plans as equi-join, not nested loop") {
    val plan = planOf("q_join_range")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Join") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("as-of join is one keyed window, no join operator at all") {
    val plan = planOf("q_join_asof")
    assert(plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("NestedLoop"))
  }

  test("IVF centroid joins broadcast; ANN query set broadcasts") {
    // both distance joins against the (tiny) centroid set must be
    // broadcast — a shuffled centroid join would defeat the index
    val ivf = planOf("q_ann_ivf_topk")
    assert(ivf.contains("BroadcastNestedLoopJoin") ||
      ivf.contains("BroadcastHashJoin"), ivf.take(3000))
    val bf = planOf("q_ann_bruteforce_topk")
    assert(bf.contains("BroadcastNestedLoopJoin"), bf.take(3000))
  }

  test("LSH bucket self-join shuffles ids only, never embedding arrays") {
    // the Exchange feeding the bucket self-join must carry
    // (id, probe, bucket) — the vec column re-enters later through the
    // candidate semi-join, so no exchange input may ship `vec` columns.
    // Run with persistLevel=NONE so the full lineage (normally hidden
    // behind InMemoryTableScan) is visible in one plan.
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val plan = graft.pipeline.VectorOps.lshNeighborPairs(
        emb, "vec_id", "embedding", bits = 6, minCosine = 0.9, probes = 2,
        persistLevel = org.apache.spark.storage.StorageLevel.NONE)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // detail section: each "(n) Exchange" block lists "Input [k]: [cols]"
    val blocks = plan.split("\\n\\n").filter(_.contains(") Exchange"))
    val joinExchanges = blocks.filter(_.contains("hashpartitioning"))
    assert(joinExchanges.nonEmpty, plan.take(3000))
    val offenders = joinExchanges.filter(b =>
      b.linesIterator.exists(l => l.startsWith("Input") && l.contains("vec#")))
    assert(offenders.isEmpty,
      s"exchange ships embedding arrays:\n${offenders.mkString("\n")}")
  }

  test("contamination join runs on hashed long shingle keys") {
    val plan = planOf("q_decontaminate")
    // every shuffle for the shingle joins must partition on the xxhash64
    // long, not the shingle string
    assert(plan.contains("xxhash64"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("sequence packing plans as windows, no global sort of the corpus") {
    val plan = planOf("q_pack_sequences")
    assert(plan.contains("Window"), plan.take(2000))
    // the only Sort allowed is the per-shard window sort (local after the
    // hash partition exchange) and the final presentation orderBy — no
    // Exchange rangepartitioning over the whole corpus BEFORE the window
    val windowIdx = plan.indexOf("Window")
    val preWindow = plan.substring(0, windowIdx)
    assert(!preWindow.contains("rangepartitioning"),
      "global range sort feeds the packing window: " + preWindow.take(1500))
  }

  test("curation pass is one aggregation over a scan-fused projection") {
    val plan = planOf("q_curation_pipeline")
    // exactly one aggregation boundary (dedup): partial+final pair
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("fanOut is a no-op on inputs already at cluster parallelism") {
    // at warehouse scale the corpus arrives in thousands of splits;
    // fanOut must NOT inject a full round-robin shuffle in front of
    // every sketch stage then — only spread genuinely narrow inputs
    val par = spark.sparkContext.defaultParallelism
    import spark.implicits._
    val wide = spark.range(0, 1000, 1, par).toDF("id")
    val fannedWide = Tables.fanOut(wide)
    assert(fannedWide.queryExecution.executedPlan.toString
      .linesIterator.forall(!_.contains("Exchange")),
      "fanOut shuffled an already-wide input")
    val narrow = spark.range(0, 1000, 1, 1).toDF("id")
    val fannedNarrow = Tables.fanOut(narrow)
    assert(fannedNarrow.rdd.getNumPartitions == par,
      "fanOut failed to spread a single-split input")
  }
}
