package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeLatest applies upserts, deletes, and inserts by version") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "status", "v")
    val changes = Seq(
      (2L, "b2", 21L, 1L, "U"),   // update key 2
      (3L, "c", 30L, 1L, "D"),    // delete key 3
      (4L, "d", 40L, 1L, "U"),    // insert key 4
      (2L, "b3", 22L, 2L, "U"))   // later update wins over version 1
      .toDF("k", "status", "v", "version", "op")
    val out = Merge.mergeLatest(snap, changes, Seq("k"), "version", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "a", 10L), (2L, "b3", 22L), (4L, "d", 40L)))
  }

  test("mergeLatest delete then re-insert at a higher version revives the key") {
    val snap = Seq((1L, "a", 10L)).toDF("k", "status", "v")
    val changes = Seq(
      (1L, "a", 10L, 1L, "D"),
      (1L, "a2", 11L, 2L, "U")).toDF("k", "status", "v", "version", "op")
    val out = Merge.mergeLatest(snap, changes, Seq("k"), "version", "op")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a2", 11L)))
  }

  test("snapshotDiff classifies I/U/D null-safely and names changed columns") {
    val old = Seq(
      (1L, Some("a"), Some(10L)),   // unchanged — must not emit
      (2L, Some("b"), Some(20L)),   // value update
      (3L, Some("c"), None),        // null -> value update
      (4L, Some("d"), Some(40L)),   // deleted
      (6L, None, None))             // both null, unchanged — must not emit
      .toDF("k", "status", "v")
    val next = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(21L)),
      (3L, Some("c"), Some(31L)),
      (5L, Some("e"), Some(50L)),   // inserted
      (6L, None, None))
      .toDF("k", "status", "v")
    val out = Merge.snapshotDiff(old, next, Seq("k"), Seq("status", "v"))
      .select("k", "change_type", "changed_cols")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (2L, "U", "v"), (3L, "U", "v"), (4L, "D", ""), (5L, "I", "")))
  }

  test("snapshotDiff recovers the change set mergeLatest applied") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "status", "v")
    val changes = Seq(
      (2L, "b2", 21L, 1L, "U"),
      (3L, "c", 30L, 1L, "D"),
      (4L, "d", 40L, 1L, "U"))
      .toDF("k", "status", "v", "version", "op")
    val merged = Merge.mergeLatest(snap, changes, Seq("k"), "version", "op")
    val diff = Merge.snapshotDiff(snap, merged, Seq("k"), Seq("status", "v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(diff === Map(2L -> "U", 3L -> "D", 4L -> "I"))
  }

  test("mergeLatest plan is a single aggregate — no join, no window, no sort") {
    val snap = Seq((1L, "a", 10L)).toDF("k", "status", "v")
    val changes = Seq((1L, "a2", 11L, 1L, "U"))
      .toDF("k", "status", "v", "version", "op")
    val plan = Merge.mergeLatest(snap, changes, Seq("k"), "version", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window") &&
      !plan.contains("Sort"), s"unexpected operator in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"arg_max_struct should hash-aggregate, got:\n$plan")
  }

  test("mergeLatest survives shuffle partials: many partitions, nullable strings") {
    val n = 5000
    val snap = spark.range(n)
      .select(col("id").as("k"),
        when(col("id") % 3 === 0, concat(lit("s"), col("id")))
          .as("status"),
        (col("id") * 10).as("v"))
      .repartition(16)
    val changes = spark.range(0, n, 2)
      .select(col("id").as("k"), lit("upd").as("status"),
        (col("id") * 10 + 1).as("v"), lit(1L).as("version"),
        when(col("id") % 10 === 0, "D").otherwise("U").as("op"))
      .repartition(16)
    val out = Merge.mergeLatest(snap, changes, Seq("k"), "version", "op")
    assert(out.count() === n - n / 10)  // multiples of 10 deleted
    val updated = out.filter(col("status") === "upd").count()
    assert(updated === n / 2 - n / 10)  // evens minus deleted tens
    val kept = out.filter(col("k") % 2 === 1 && col("k") % 3 === 0)
      .select("status").distinct().collect().map(_.getString(0)).toSeq
    assert(kept.forall(_.startsWith("s")))  // untouched odd rows intact
  }

  test("arg_max_struct is SQL-registered via GraftExtensions") {
    Seq((1L, "a", 0L), (1L, "b", 5L), (2L, "c", 1L))
      .toDF("k", "s", "ver").createOrReplaceTempView("argmax_in")
    val out = spark.sql(
      """SELECT k, arg_max_struct(struct(s), ver).s AS s
        |FROM argmax_in GROUP BY k ORDER BY k""".stripMargin)
      .as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "b"), (2L, "c")))
  }

  test("scd2History builds half-open intervals with a current row per key") {
    val log = Seq(
      (1L, 100L, 1L, "new"), (1L, 200L, 2L, "active"), (1L, 300L, 3L, "closed"),
      (2L, 150L, 4L, "new"))
      .toDF("user_id", "ts", "event_id", "state")
    val out = Merge.scd2History(log, Seq("user_id"), "ts", "event_id",
        Seq("state"))
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out === Seq(
      (1L, "new", 100L, Some(200L), false),
      (1L, "active", 200L, Some(300L), false),
      (1L, "closed", 300L, None, true),
      (2L, "new", 150L, None, true)))
  }

  test("scd2History ties on the same timestamp break by the tie column") {
    val log = Seq((1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"))
      .toDF("user_id", "ts", "event_id", "state")
    val out = Merge.scd2History(log, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "state"))
      .select("event_id", "valid_to", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, Some(100L), false), (2L, None, true)))
  }

  test("pointInTimeJoin picks the version valid at each fact instant") {
    import org.apache.spark.sql.functions.col
    // user u: state a@10, b@20; facts at 5 (before any), 10 (boundary ->
    // a), 15 (a), 20 (boundary -> b), 25 (b); user v has no history
    val log = Seq(("u", 10L, 1L, "a"), ("u", 20L, 2L, "b"))
      .toDF("user_id", "ts", "event_id", "state")
    val hist = Merge.scd2History(log, Seq("user_id"), "ts", "event_id",
      Seq("state"))
    val facts = Seq(("u", 5L, 100L), ("u", 10L, 101L), ("u", 15L, 102L),
      ("u", 20L, 103L), ("u", 25L, 104L), ("v", 15L, 105L))
      .toDF("user_id", "ts", "event_id")
    val out = Merge.pointInTimeJoin(facts, hist, "user_id", "ts", "state")
      .select("event_id", "pit_state")
      .as[(Long, Option[String])].collect().toMap
    assert(out == Map(100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 104L -> Some("b"), 105L -> None))
  }
}
