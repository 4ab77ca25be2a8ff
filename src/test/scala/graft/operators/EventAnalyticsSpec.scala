package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")

  test("funnel counts only users whose steps occur in order") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "signup"),   // full path, in order
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "click"),    // click BEFORE signup
      (2L, "2024-01-01 11:00:00", "signup"),
      (2L, "2024-01-01 12:00:00", "purchase"), // purchase after signup but
      (3L, "2024-01-01 10:00:00", "signup"),   //   no in-order click → step 1
      (4L, "2024-01-01 10:00:00", "purchase")) // never signed up → step 0
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq(
      (0, "signup", 3L),    // users 1, 2, 3
      (1, "click", 1L),     // only user 1 clicked after signing up
      (2, "purchase", 1L)))
  }

  test("funnel: a later re-occurrence of an earlier step unlocks the rest") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "click"),   // too early, before signup
      (1L, "2024-01-01 11:00:00", "signup"),
      (1L, "2024-01-01 12:00:00", "click"),   // second click counts
      (1L, "2024-01-01 13:00:00", "purchase"))
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out.map(_._3) === Seq(1L, 1L, 1L))
  }

  test("funnel: equal timestamps count in step order, matching the >= oracle") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:00:00", "click"))   // same instant as signup
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out.map(_._3) === Seq(1L, 1L))
  }

  test("funnel plan has no join and a single shuffle on the user key") {
    val events = ev((1L, "2024-01-01 10:00:00", "signup"))
    val plan = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "click")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not self-join:\n$plan")
  }

  test("cohortRetention buckets users by first-seen week") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort week Jan 1 (Monday)
      (1L, ts("2024-01-09 10:00:00")), // active in week offset 1
      (2L, ts("2024-01-02 10:00:00")), // same cohort, only week 0
      (3L, ts("2024-01-10 10:00:00"))) // cohort week Jan 8
      .toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events, "user_id", "ts", "week")
      .select(col("cohort").cast("string"), col("offset"),
        col("active_users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01 00:00:00", 0L, 2L),
      ("2024-01-01 00:00:00", 1L, 1L),
      ("2024-01-08 00:00:00", 0L, 1L)))
  }

  test("gapFillHourly fills missing buckets forward and flags them") {
    val events = Seq(
      (1L, ts("2024-01-01 10:15:00"), 100L, 1.0),
      (1L, ts("2024-01-01 10:45:00"), 101L, 2.0), // same bucket: latest wins
      (1L, ts("2024-01-01 13:30:00"), 102L, 5.0)) // 11:00 and 12:00 are gaps
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.gapFillHourly(
        events, "user_id", "ts", "event_id", "value")
      .select(col("h").cast("string"), col("value"), col("is_gap"))
      .as[(String, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01 10:00:00", 2.0, false),
      ("2024-01-01 11:00:00", 2.0, true),
      ("2024-01-01 12:00:00", 2.0, true),
      ("2024-01-01 13:00:00", 5.0, false)))
  }

  test("gapFillHourly ties inside a bucket break by the tie column") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, 9.0),  // higher tie id wins
      (1L, ts("2024-01-01 10:00:00"), 1L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.gapFillHourly(
        events, "user_id", "ts", "event_id", "value")
      .select("value").as[Double].collect().toSeq
    assert(out === Seq(9.0))
  }

  test("gapFillHourly keeps keys independent") {
    val events = Seq(
      (1L, ts("2024-01-01 10:30:00"), 1L, 1.0),
      (1L, ts("2024-01-01 12:30:00"), 2L, 2.0),
      (2L, ts("2024-01-01 11:10:00"), 3L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.gapFillHourly(
        events, "user_id", "ts", "event_id", "value")
      .select(col("k"), col("value"), col("is_gap"))
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1.0, false), (1L, 1.0, true), (1L, 2.0, false),
      (2L, 7.0, false)))
  }

  test("ewma folds in (ts, tie) order; single event is identity") {
    val events = Seq(
      // user 1 out of storage order: sorted values are 8, 4, 2
      (1L, ts("2026-01-01 10:02:00"), 3L, 2.0),
      (1L, ts("2026-01-01 10:00:00"), 1L, 8.0),
      (1L, ts("2026-01-01 10:01:00"), 2L, 4.0),
      // user 2: equal timestamps — tie column orders 10 then 20
      (2L, ts("2026-01-01 09:00:00"), 2L, 20.0),
      (2L, ts("2026-01-01 09:00:00"), 1L, 10.0),
      (3L, ts("2026-01-01 08:00:00"), 1L, 5.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.ewma(events, "user_id", "ts", "event_id",
        "value", alpha = 0.5)
      .select("user_id", "n_events", "ewma")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // u1: s=8 -> (8+4)/2=6 -> (6+2)/2=4 ; u2: s=10 -> (10+20)/2=15
    assert(out === Seq((1L, 3L, 4.0), (2L, 2L, 15.0), (3L, 1L, 5.5)))
  }

  test("hot key over maxEventsPerKey fails fast with the key in the message") {
    val hot = (1 to 6).map(i =>
      (99L, ts(f"2026-01-01 10:00:${i % 60}%02d"), i.toLong, 1.0))
    val ok = Seq((1L, ts("2026-01-01 10:00:00"), 1L, 2.0))
    val events = (hot ++ ok).toDF("user_id", "ts", "event_id", "value")
    val e = intercept[Exception] {
      EventAnalytics.ewma(events, "user_id", "ts", "event_id", "value",
        alpha = 0.5, maxEventsPerKey = 5).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("ewma: key 99 has 6 events"), msg)
    // healthy data under the same bound is untouched
    assert(EventAnalytics.ewma(ok.toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", alpha = 0.5,
      maxEventsPerKey = 5).count() == 1)
    // funnel shares the guard
    val f = intercept[Exception] {
      EventAnalytics.funnel(
        hot.toDF("user_id", "ts", "event_id", "event_type")
          .withColumn("event_type", lit("signup")),
        "user_id", "ts", "event_type", Seq("signup"),
        maxEventsPerKey = 5).collect()
    }
    val fmsg = Option(f.getMessage).getOrElse("") +
      Option(f.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(fmsg.contains("funnel: key 99 has 6 events"), fmsg)
  }

  test("ewma plan is join-free with one shuffle on the key") {
    val events = Seq((1L, ts("2026-01-01 10:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val plan = EventAnalytics.ewma(events, "user_id", "ts", "event_id",
      "value", alpha = 0.25).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(1500))
  }

  test("seriesNearestPairs: aligned distance, overlap floor, canonical pairs") {
    import org.apache.spark.sql.functions.col
    // u1 and u2 identical on buckets 1..3 (dist 0); u3 offset by 2 on
    // each shared bucket (dist 3 * 4 = 12); u4 shares only one bucket
    val events = Seq(
      ("u1", 1L, 10.0), ("u1", 2L, 20.0), ("u1", 3L, 30.0),
      ("u2", 1L, 10.0), ("u2", 2L, 20.0), ("u2", 3L, 30.0),
      ("u3", 1L, 12.0), ("u3", 2L, 22.0), ("u3", 3L, 32.0),
      ("u4", 1L, 99.0)
    ).toDF("k", "b", "v")
    val got = EventAnalytics.seriesNearestPairs(events, "k", col("b"),
        "v", minSharedBuckets = 2)
      .select("a", "b", "dist2", "n_shared")
      .as[(String, String, Double, Long)].collect().toSet
    assert(got == Set(("u1", "u2", 0.0, 3L), ("u1", "u3", 12.0, 3L),
      ("u2", "u3", 12.0, 3L)))
    // bucket means: duplicate readings average before distancing
    val dup = events.unionAll(Seq(("u1", 1L, 30.0)).toDF("k", "b", "v"))
    val d12 = EventAnalytics.seriesNearestPairs(dup, "k", col("b"),
        "v", 2).where(col("a") === "u1" && col("b") === "u2")
      .select("dist2").as[Double].head()
    assert(d12 == 100.0) // u1 bucket 1 mean is now 20 -> (20-10)^2
  }

  test("anomalies flags exactly the values beyond k rounded sigmas") {
    import org.apache.spark.sql.functions.col
    // k1: ninety-nine 10.0s and one 1000.0 — mean 19.9, stddev exactly
    // 99.0, so the outlier sits at z = 9.9 and the tens at z = 0.1
    // (note a single outlier among n points can never exceed
    // z = (n-1)/sqrt(n), so n must be large enough for 3 sigma);
    // k2: constant values, stddev 0, nothing can flag
    val events = (Seq.fill(99)(("k1", 10.0)) :+ (("k1", 1000.0))) ++
      Seq.fill(4)(("k2", 5.0))
    val got = EventAnalytics.anomalies(events.toDF("k", "v"),
        Seq("k"), "v", k = 3.0)
      .where(col("is_anomaly")).select("k", "v")
      .as[(String, Double)].collect().toSet
    assert(got == Set(("k1", 1000.0)))
  }

  test("resampleOhlc picks open/close by (ts, tie) order, one row per bucket") {
    import org.apache.spark.sql.functions.{col, floor => ffloor}
    // key k1 bucket 0: ts 1,2,2,3 — tie breaks the ts=2 pair
    val events = Seq(
      ("k1", 3L, 1L, 30.0), ("k1", 1L, 1L, 10.0),
      ("k1", 2L, 2L, 99.0), ("k1", 2L, 1L, 5.0),
      ("k1", 12L, 1L, 7.0),                       // bucket 1, single event
      ("k2", 4L, 1L, 50.0), ("k2", 5L, 1L, 40.0)
    ).toDF("k", "ts", "tie", "v")
    val got = EventAnalytics.resampleOhlc(events, Seq("k"),
        ffloor(col("ts") / 10).as("b"), "ts", "tie", "v")
      .select("k", "bucket", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(got == Set(
      ("k1", 0L, 10.0, 99.0, 5.0, 30.0, 4L),
      ("k1", 1L, 7.0, 7.0, 7.0, 7.0, 1L),
      ("k2", 0L, 50.0, 50.0, 40.0, 40.0, 2L)))
  }

  test("resampleOhlc plan is a single aggregation — no window, no join") {
    import org.apache.spark.sql.functions.{col, floor => ffloor}
    val events = Seq(("k", 1L, 1L, 1.0)).toDF("k", "ts", "tie", "v")
    val plan = EventAnalytics.resampleOhlc(events, Seq("k"),
        ffloor(col("ts") / 10).as("b"), "ts", "tie", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(1500))
  }
}
