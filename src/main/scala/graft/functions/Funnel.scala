package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis over an event stream — "how many
  * users did A, then B strictly after, then C strictly after that,
  * (optionally) completing each step within a bound" — the classic
  * product-analytics operator (ClickHouse `windowFunnel`, Amplitude
  * funnels), absent from Spark's built-ins.
  *
  * Semantics: t_1 = min ts of step 1 per user; t_k = min ts of step k
  * STRICTLY after t_{k-1} (and within `window` of t_{k-1} when bounded).
  * Greedy-earliest is the standard funnel definition and makes the whole
  * computation k chained (filter -> join -> min) stages, each shuffling
  * only (user, ts) pairs on the user key — after the first shuffle every
  * stage is co-partitioned, and the event table itself is scanned once
  * per step with the step predicate pushed down. No per-user event-list
  * materialization, no session state: at 100 TB the state per stage is
  * one timestamp per surviving user.
  */
object Funnel {

  /** Per-step reach counts + step-over-step conversion.
    * Output: (step, event_type, n_users, conv_from_prev) — k rows. */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      window: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val stages = scala.collection.mutable.Buffer((1, steps.head, cur))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val afterPrev = col(tsCol) > col("_prev")
      val inWindow = window
        .map(w => col(tsCol) <= col("_prev") + expr(s"INTERVAL $w"))
        .getOrElse(lit(true))
      cur = events.filter(col(typeCol) === st)
        .join(cur.select(col(userCol), col("_t").as("_prev")), Seq(userCol))
        .filter(afterPrev && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      stages += ((i + 1, st, cur))
    }
    val counts = stages.map { case (i, st, f) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(st).as(typeCol), col("n_users"))
    }.reduce(_ unionByName _)
    // k-row frame: the single-partition window is by construction tiny
    val w = Window.orderBy("step")
    counts.withColumn("conv_from_prev",
      when(col("step") === 1, lit(1.0))
        .otherwise(col("n_users").cast("double")
          / lag(col("n_users"), 1).over(w).cast("double")))
  }

  /** Conversion-latency distribution: for users who complete the WHOLE
    * funnel (same strict-order greedy-earliest semantics as
    * [[funnelSteps]]), the first-step→last-step delay in whole seconds,
    * summarized as log-histogram sketch quantiles — p50/p90/p99
    * time-to-convert in ONE partial-aggregable pass over one value per
    * converting user, no sort ([[graft.functions.Sketches]] contract:
    * < 1/16 relative-error lower bounds, bit-reproducible). Output:
    * (g='all', q_permille, n_rows, qtile_lb) — qtile_lb in seconds. */
  def conversionLatency(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      window: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "latency needs at least two funnel steps")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      .withColumn("_t0", col("_t"))
    for (st <- steps.drop(1)) {
      val inWindow = window
        .map(w => col(tsCol) <= col("_prev") + expr(s"INTERVAL $w"))
        .getOrElse(lit(true))
      cur = events.filter(col(typeCol) === st)
        .join(cur.select(col(userCol), col("_t").as("_prev"), col("_t0")),
          Seq(userCol))
        .filter(col(tsCol) > col("_prev") && inWindow)
        .groupBy(col(userCol), col("_t0")).agg(min(col(tsCol)).as("_t"))
    }
    val deltas = cur.select(
      expr("(unix_micros(_t) - unix_micros(_t0)) div 1000000").as("_v"))
      .withColumn("g", lit("all"))
    graft.functions.Sketches.logHistDistribution(deltas, Seq("g"),
      col("_v"), Seq(500, 900, 990))
  }

  /** Census of session-opening behavior paths: sessionize each user's
    * stream by inactivity gap (new session when >= `gapMinutes` since the
    * previous event), take each session's first `prefixLen` event types in
    * (ts, tie) order, and count sessions per path string ("a>b>c") — the
    * sequence-mining companion to [[funnelSteps]]: the funnel counts a
    * KNOWN sequence, the path census discovers which sequences happen.
    *
    * Scale shape: two per-user windows (boundary mark + in-session rank)
    * over the user-partitioned stream — no self-join — then the bounded
    * session-prefix rows (<= prefixLen per session) aggregate twice,
    * both partial-aggregable; path cardinality is |event types|^prefixLen,
    * a metadata-sized census. */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapMinutes: Int = 30,
      prefixLen: Int = 3): DataFrame = {
    val wOrd = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    // microsecond precision: casting to long would truncate sub-second
    // parts and flip gap decisions right at the threshold (caught by the
    // 10x replay, whose timestamps carry micros)
    val marked = events.withColumn("_new",
      when(unix_micros(col(tsCol)) -
        lag(unix_micros(col(tsCol)), 1).over(wOrd) >=
          gapMinutes * 60L * 1000000L, 1)
        .when(lag(col(tsCol), 1).over(wOrd).isNull, 1)
        .otherwise(0))
    val sid = marked.withColumn("_sid", sum(col("_new")).over(
      wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wS = Window.partitionBy(col(userCol), col("_sid"))
      .orderBy(col(tsCol), col(tieCol))
    sid.withColumn("_rn", row_number().over(wS))
      .filter(col("_rn") <= prefixLen)
      .groupBy(col(userCol), col("_sid"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_rn"),
          col(typeCol).as("t")))), e => e.getField("t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
  }

  /** Temporal-split evaluation of the first-order Markov transition model
    * (the census `event_transitions` builds): train per-(from → to)
    * counts on the first `trainDays` epoch-days, predict each from-type's
    * argmax next type (ties: to_type ASC), score top-1 accuracy on the
    * remaining days — the eval that says whether session flows are
    * predictable enough to act on (prefetching, next-step UX). Per-user
    * lag windows only; the learned model is |types|² rows broadcast back
    * onto the test transitions; the split day derives from a one-row min
    * aggregate (metadata collect). Transitions straddling the cutoff
    * belong to their TO-event's day. All-integer outputs. */
  def markovAccuracy(events: DataFrame, userCol: String, tieCol: String,
      typeCol: String, tsCol: String, trainDays: Int = 21): DataFrame = {
    require(trainDays >= 1)
    val w = Window.partitionBy(userCol).orderBy(tieCol)
    val dayExpr = expr(s"unix_date(to_date($tsCol))").cast("long")
    val trans = events
      .select(col(userCol), col(tieCol), col(typeCol), dayExpr.as("_day"))
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col(typeCol).as("to_type"), col("_day"))
    val minRow = events.agg(min(dayExpr)).collect()(0)
    require(!minRow.isNullAt(0), "no events to split")
    val cutoff = minRow.getLong(0) + trainDays
    val model = trans.filter(col("_day") < cutoff)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("from_type")
          .orderBy(col("n").desc, col("to_type"))))
      .filter(col("_rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    trans.filter(col("_day") >= cutoff)
      .join(broadcast(model), Seq("from_type"), "left")
      .groupBy("from_type")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr(
        "CAST(n_correct AS DECIMAL(38,0)) * 1000000 div n_test"))
  }

  /** Last-touch conversion attribution — the census marketing analytics
    * runs next to the funnel: for every conversion event, the user's most
    * recent NON-conversion event within `horizonSeconds` is the credited
    * touch (none, or none recent enough → "(direct)"); output is
    * conversions per credited type. One per-user window (the
    * [[sessionPaths]] no-self-join contract): a conditional
    * last-ignoring-nulls over the (ts, tie)-ordered stream carries both
    * the touch type and its timestamp — the same row supplies both
    * because the ordering is total — and the horizon check is exact
    * micros arithmetic. At 100 TB the state per row is two columns; the
    * event log never joins itself. */
  def attributionLastTouch(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, conversionType: String,
      horizonSeconds: Long = 7L * 86400L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("_touch_t", last(
        when(col(typeCol) =!= conversionType, col(typeCol)),
        ignoreNulls = true).over(w))
      .withColumn("_touch_ts", last(
        when(col(typeCol) =!= conversionType, col(tsCol)),
        ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("attributed",
        when(col("_touch_ts").isNotNull &&
          unix_micros(col(tsCol)) - unix_micros(col("_touch_ts")) <=
            horizonSeconds * 1000000L,
          col("_touch_t")).otherwise(lit("(direct)")))
      .groupBy("attributed")
      .agg(count(lit(1)).as("n_conversions"))
  }
}
