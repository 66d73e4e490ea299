package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.10: absent in the reference — this
  * is the incremental-refresh extension over event streams).
  *
  * All transforms are defined on a plain DataFrame so the SAME code runs in
  * batch (spark.read) and streaming (spark.readStream) — the Spark-native way
  * to keep one implementation for both the reference's one-shot batch mode
  * and a continuously-refreshing deployment.
  *
  * Scale notes: windowed aggregations shuffle on (window, key) with partial
  * aggregation map-side; the watermark bounds state size (late data beyond
  * 10 minutes is dropped); sessionization state is per-user and times out on
  * the event-time watermark, so state is O(active users), not O(events).
  */
object EventStreams {

  /** Tumbling 1-minute counts + exact decimal sums per event type, with a
    * 10-minute watermark. Works on batch and streaming frames alike. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 5-minute windows every minute: rate-style rollup. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Built-in event-time session windows (gap-based), 5-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup (the streaming twin of x1_exact_dedup): drops
    * repeats of (user_id, ts, event_type) with state bounded by the
    * watermark — dropDuplicatesWithinWatermark evicts seen-keys once they
    * age past it, so state is O(events in the watermark horizon), not
    * O(all history). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "ts", "event_type")

  /** Stream-stream interval join: each "click" joined to the same user's
    * "view"s within the following 5 minutes. Both sides carry watermarks
    * and the join condition bounds event-time distance, so each side's
    * buffered state is evictable — the state-bounded shape required for
    * unbounded streams (equi key: user_id; time bound: interval). */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val v = views.filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"))
  }

  /** Stream-static enrichment: the event stream joined to a static (batch)
    * dimension — Spark broadcasts the dim per micro-batch, no stream state
    * at all. `dim` must be a batch frame with (user_id, segment). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  // -- custom state: sessionization via flatMapGroupsWithState ----------------

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, sumValue: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Int, sum_value: Double)

  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Running per-user totals via mapGroupsWithState (Update-mode state:
    * one output row per user per micro-batch, state never expires here —
    * a production deployment would add a timeout like [[sessionize]]). */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[UserTotals]) => {
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          val batch = it.toSeq
          val next = UserTotals(userId,
            prev.n_events + batch.size,
            prev.sum_value + batch.map(_.value).sum)
          state.update(next)
          next
        })
  }

  /** Gap-based sessionizer with explicit state: emits a session when the gap
    * between consecutive events exceeds `gapMs`, or on event-time timeout.
    * The custom-state twin of [[sessionCounts]] — for session logic the
    * built-in session_window cannot express (e.g. value-dependent gaps). */
  def sessionize(events: Dataset[Event], gapMs: Long = 5 * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.n, s.sumValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1, e.value)
              else if (t - cur.lastTs > gapMs) {
                out += Session(userId, new Timestamp(cur.start),
                  new Timestamp(cur.lastTs), cur.n, cur.sumValue)
                cur = SessionState(t, t, 1, e.value)
              } else cur = cur.copy(lastTs = math.max(cur.lastTs, t),
                n = cur.n + 1, sumValue = cur.sumValue + e.value)
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.lastTs + gapMs)
            out.iterator
          }
        })
  }
}
