package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session windows over an event stream with CUSTOM state —
  * the `flatMapGroupsWithState` seat of the engine (the one Structured
  * Streaming surface the catalog's windowed/sketch seats don't exercise):
  * a session is a maximal run of a user's events with < `gapMinutes`
  * between neighbors; closed sessions are emitted in append mode either
  * when a later event of the same user arrives past the gap (mid-batch
  * close) or when the WATERMARK passes `last + gap` (event-time timeout —
  * the open session can never again be extended, so it is final).
  *
  * Why custom state and not `session_window`: the state carried per key
  * is exactly one open session (start, last, n) — constant bytes per
  * user, the smallest state this computation admits — and the timeout
  * contract makes emission deterministic under replay (a re-delivered
  * batch extends state idempotently because event-time order, not
  * arrival order, drives the gap decisions within a batch).
  *
  * Exactness: [[sessionizeBatch]] is the same decision procedure as one
  * batch window pass (lag + cumulative boundary count — the
  * `window_session` / sessionPaths shape); StreamingSpec pins
  * stream == batch on the closed-session set. Gap compares in exact
  * micros ([[graft.functions.Funnel.sessionPaths]]'s truncation lesson).
  *
  * PRECONDITION for stream == batch: each user's events must arrive
  * in event-time order ACROSS batches (within a batch any order is
  * fine — the step sorts). The mid-batch close finalizes a session as
  * soon as a same-user event past the gap arrives, even though the
  * watermark may still admit a late-but-valid event that belonged
  * INSIDE the just-closed session; if such an event lands in a later
  * batch it is folded into the wrong (next) session. Sources that
  * partition by user (e.g. a user-keyed Kafka topic) satisfy the
  * precondition naturally. When cross-batch reordering is possible and
  * exactness matters more than latency, close ONLY via the event-time
  * timeout (drop the mid-batch emit): every close then waits for the
  * watermark, which bounds all admissible lateness. */
object Sessions {

  /** `ts` carries the WATERMARKED event-time column through the typed
    * plan (a `map` that dropped it would lose the watermark tag and fail
    * analysis for event-time timeout); the state logic itself uses the
    * exact-micros twin. */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class Open(start_us: Long, last_us: Long, n: Long)
  case class Closed(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** The per-key state transition: fold this batch's events (event-time
    * order) into the open session, emitting every session a gap closes;
    * park the rest in state with an event-time timeout at last + gap. */
  private def step(gapUs: Long)(user: Long, rows: Iterator[Ev],
      state: GroupState[Open]): Iterator[Closed] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Closed(user, s.start_us, s.last_us, s.n))
    } else {
      val evs = rows.toArray.sortBy(_.ts_us)
      val out = scala.collection.mutable.ArrayBuffer.empty[Closed]
      var open = state.getOption
      evs.foreach { e =>
        open = open match {
          case Some(s) if e.ts_us - s.last_us < gapUs =>
            Some(Open(s.start_us, math.max(s.last_us, e.ts_us), s.n + 1))
          case Some(s) =>
            out += Closed(user, s.start_us, s.last_us, s.n)
            Some(Open(e.ts_us, e.ts_us, 1))
          case None => Some(Open(e.ts_us, e.ts_us, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // final when the watermark passes last + gap: no event that could
        // extend the session can still arrive
        state.setTimeoutTimestamp((s.last_us + gapUs) / 1000L)
      }
      out.iterator
    }
  }

  /** Streaming sessionization: `events` must carry (userCol, tsCol
    * TIMESTAMP); emits one row per CLOSED session. `watermarkDelay`
    * bounds lateness (and therefore how long an open session can wait
    * before the timeout finalizes it). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[Closed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"), unix_micros(col(tsCol)).as("ts_us"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step(gapUs))
  }

  /** The batch twin (one pass, two per-user windows — the
    * `window_session` shape): the COMPLETE session set of a finite
    * dataset, for parity pins against the stream's closed set. */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("user_id").orderBy(col("_us"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("_us"))
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(wOrd) >= gapUs, 1)
          .when(lag(col("_us"), 1).over(wOrd).isNull, 1)
          .otherwise(0))
      .withColumn("_sid", sum(col("_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(min(col("_us")).as("session_start_us"),
        max(col("_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .drop("_sid")
  }
}
