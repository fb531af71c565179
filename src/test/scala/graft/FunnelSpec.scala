package graft

import graft.functions.{Funnel, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))

  test("funnel: strict order required — later steps before earlier don't count") {
    val df = ev(
      // user 1 completes A -> B -> C in order
      (1L, "A", "2024-01-01 10:00:00"),
      (1L, "B", "2024-01-02 10:00:00"),
      (1L, "C", "2024-01-03 10:00:00"),
      // user 2 does B before A: reaches step 1 only
      (2L, "B", "2024-01-01 09:00:00"),
      (2L, "A", "2024-01-01 10:00:00"),
      // user 3 never does A
      (3L, "B", "2024-01-01 10:00:00"),
      (3L, "C", "2024-01-02 10:00:00"))
    val out = Funnel.funnelSteps(df, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(out == Seq(2L, 1L, 1L))
  }

  test("funnel: greedy-earliest anchor — a later A cannot resurrect the funnel") {
    // B exists only BEFORE the first A; a second A after B must not help,
    // because the anchor is min(ts of A) (standard funnel semantics)
    val df = ev(
      (1L, "B", "2024-01-01 09:00:00"),
      (1L, "A", "2024-01-01 10:00:00"),
      (1L, "A", "2024-01-01 08:00:00"))
    val out = Funnel.funnelSteps(df, "user_id", "event_type", "ts",
        Seq("A", "B"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L)) // first A at 08:00, B at 09:00 follows it
  }

  test("funnel: window bound drops conversions outside the step deadline") {
    val df = ev(
      (1L, "A", "2024-01-01 10:00:00"),
      (1L, "B", "2024-01-05 10:00:00"), // 4 days after A
      (2L, "A", "2024-01-01 10:00:00"),
      (2L, "B", "2024-01-01 11:00:00"))
    val bounded = Funnel.funnelSteps(df, "user_id", "event_type", "ts",
        Seq("A", "B"), window = Some("1 DAYS"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(bounded == Seq(2L, 1L))
    val unbounded = Funnel.funnelSteps(df, "user_id", "event_type", "ts",
        Seq("A", "B"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(unbounded == Seq(2L, 2L))
  }

  test("funnel: conversion rates are step-over-step") {
    val df = ev(
      (1L, "A", "2024-01-01 10:00:00"), (1L, "B", "2024-01-01 11:00:00"),
      (2L, "A", "2024-01-01 10:00:00"), (2L, "B", "2024-01-01 11:00:00"),
      (3L, "A", "2024-01-01 10:00:00"), (4L, "A", "2024-01-01 10:00:00"))
    val out = Funnel.funnelSteps(df, "user_id", "event_type", "ts",
        Seq("A", "B"))
      .orderBy("step").select("conv_from_prev").as[Double].collect().toSeq
    assert(out == Seq(1.0, 0.5))
  }

  test("joinSizeSketch: exact when buckets never collide, upper bound otherwise") {
    // keys 0..99 on side A (1 row each), side B has key k repeated k%3+1
    // times; true join size = sum over k of (k%3+1) = 200
    val a = (0 until 100).map(i => i.toLong).toDF("k")
    val b = (0 until 100).flatMap(i => Seq.fill(i % 3 + 1)(i.toLong)).toDF("k")
    val trueSize = a.join(b, Seq("k")).count()
    val est = Sketches.joinSizeSketch(a, col("k"), b, col("k"))
      .select("est_join_size").as[Long].head()
    assert(est >= trueSize) // collisions only ADD phantom pairs
    // expected collision mass for 100 keys in 4096 buckets is ~1 pair;
    // 10% slack bounds the phantom contribution
    assert(est <= trueSize * 1.10, s"est $est vs true $trueSize")
  }

  test("joinSizeSketch: histograms merge — sketch of union == sum of sketches") {
    val a1 = (0 until 50).map(i => i.toLong).toDF("k")
    val a2 = (50 until 100).map(i => i.toLong).toDF("k")
    val b = (0 until 100).map(i => (i % 10).toLong).toDF("k")
    val whole = Sketches.joinSizeSketch(a1.union(a2), col("k"), b, col("k"))
      .select("est_join_size").as[Long].head()
    val part1 = Sketches.joinSizeSketch(a1, col("k"), b, col("k"))
      .select("est_join_size").as[Long].head()
    val part2 = Sketches.joinSizeSketch(a2, col("k"), b, col("k"))
      .select("est_join_size").as[Long].head()
    assert(whole == part1 + part2)
  }

  test("sessionPaths: gap splits sessions, prefix caps at 3, census counts " +
    "sessions per path") {
    // user 1: a,b,c,d within gaps < 30min -> ONE session, path a>b>c
    // (d beyond the prefix); then a 40-min silence -> second session e,f
    // user 2: lone g -> path g; user 3: a,b close together -> a>b
    val rows = Seq(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "b", "2024-01-01 10:05:00"),
      (1L, "c", "2024-01-01 10:10:00"), (1L, "d", "2024-01-01 10:20:00"),
      (1L, "e", "2024-01-01 11:00:00"), (1L, "f", "2024-01-01 11:05:00"),
      (2L, "g", "2024-01-01 09:00:00"),
      (3L, "a", "2024-01-01 09:00:00"), (3L, "b", "2024-01-01 09:01:00"))
    val df = rows.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("event_id", monotonically_increasing_id())
    val got = Funnel.sessionPaths(df, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30, prefixLen = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b>c" -> 1L, "e>f" -> 1L, "g" -> 1L, "a>b" -> 1L))
  }

  test("conversionLatency: completers' first->last delay lands in the " +
    "right sketch buckets; non-completers excluded") {
    // user 1 converts in 100 s; user 2 converts in 1000 s; user 3 never
    // purchases -> excluded
    val rows = Seq(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:00:40"),
      (1L, "purchase", "2024-01-01 10:01:40"),
      (2L, "view", "2024-01-01 09:00:00"), (2L, "click", "2024-01-01 09:10:00"),
      (2L, "purchase", "2024-01-01 09:16:40"),
      (3L, "view", "2024-01-01 08:00:00"), (3L, "click", "2024-01-01 08:01:00"))
    val got = Funnel.conversionLatency(ev(rows: _*), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .select("q_permille", "n_rows", "qtile_lb")
      .as[(Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // n = 2 completers; p50 -> rank 1 -> 100 s (bucket lb: e=6, sub=9 ->
    // (16+9)*64/16 = 100); p90/p99 -> rank 2 -> 1000 s (e=9,
    // sub=(1000-512)*16/512=15 -> (16+15)*512/16 = 992)
    assert(got(500) == ((2L, 100L)))
    assert(got(900) == ((2L, 992L)))
    assert(got(990) == ((2L, 992L)))
  }

  test("attributionLastTouch: credits the most recent non-conversion " +
    "touch inside the horizon; outside or absent -> (direct)") {
    val rows = Seq(
      // user 1: view then purchase 1h later -> credit view
      (1L, "view", "2024-01-10 09:00:00"),
      (1L, "purchase", "2024-01-10 10:00:00"),
      // user 2: click 8 days before purchase -> outside 7d -> (direct)
      (2L, "click", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-09 10:00:01"),
      // user 3: purchase with no prior events -> (direct); the purchase
      // itself must never self-credit
      (3L, "purchase", "2024-01-10 10:00:00"),
      // user 4: click then view then purchase -> LAST touch (view) wins
      (4L, "click", "2024-01-10 08:00:00"),
      (4L, "view", "2024-01-10 09:00:00"),
      (4L, "purchase", "2024-01-10 10:00:00"))
    val df = rows.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("event_id", monotonically_increasing_id())
    val got = Funnel.attributionLastTouch(df, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 2L, "(direct)" -> 2L))
  }

  test("markovAccuracy: temporal split trains the argmax model on early " +
    "days and scores only later transitions") {
    // train window (day 0): u1 stream a,b,a,b -> counts a->b:2, b->a:1
    // => model: a predicts b, b predicts a
    // test window (day 25): u2 a,b (a->b correct), u3 b,b (b->b wrong)
    val rows = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 2L, "b", "2024-01-01 10:01:00"),
      (1L, 3L, "a", "2024-01-01 10:02:00"),
      (1L, 4L, "b", "2024-01-01 10:03:00"),
      (2L, 5L, "a", "2024-01-26 10:00:00"),
      (2L, 6L, "b", "2024-01-26 10:01:00"),
      (3L, 7L, "b", "2024-01-26 10:00:00"),
      (3L, 8L, "b", "2024-01-26 10:01:00"))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Funnel.markovAccuracy(df, "user_id", "event_id",
        "event_type", "ts", trainDays = 21)
      .select("from_type", "n_test", "n_correct", "acc_ppm")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1L, 1L, 1000000L), ("b", 1L, 0L, 0L)))
  }

  test("sessionPaths: a gap of exactly the threshold starts a new session") {
    val rows = Seq(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "b", "2024-01-01 10:30:00"))
    val df = rows.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("event_id", monotonically_increasing_id())
    val got = Funnel.sessionPaths(df, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30, prefixLen = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L))
  }
}
