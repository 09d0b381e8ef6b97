package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators the reference lacks entirely
  * (SURVEY.md §2.6: no windows, no watermarks, no event time — its only
  * stateful shape is an ever-growing running count). These are the
  * streaming twins of [[graft.operators.Events]], built on watermarked
  * Structured Streaming state so state is BOUNDED — the fix for the
  * reference's unbounded dict (SURVEY.md §7.4(4)) and a hard requirement
  * for a 100 TB/day stream.
  */
object EventStreams {

  /** Tumbling event-time window aggregate with late-data tolerance.
    * Watermark bounds state: windows older than `lateness` behind the
    * max seen event time are finalized and evicted. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      // decimal-cast sum, same as the batch twin (q12_events_daily): a
      // plain sum(double) is partition-order dependent in the last ulp,
      // which can flap the batch/stream convergence check
      .agg(count(lit(1)).as("n_events"),
        graft.core.Num.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-once dedup by event id within the watermark horizon —
    * the declarative form of the reference's tuple-id dedup dict
    * (worker.py:446-453), with bounded instead of unbounded state. */
  def dedupEvents(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase pairs with the same
    * user's clicks from the preceding `window`. Both sides carry
    * watermarks so join state is bounded and evicted as time advances —
    * the streaming twin of the batch as-of join (operators.Events ev02),
    * and machinery the reference cannot express at all.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      window: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", window)
    val p = purchases.select(col("user_id").as("p_user"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", window)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("click_ts"))
  }

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Session windows (gap-based) via flatMapGroupsWithState with an
    * event-time timeout: a session closes when the watermark passes
    * last-event + gap, emitting exactly one row per closed session.
    * State per live user session only — bounded by the active-user count.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)(
      implicit enc: org.apache.spark.sql.Encoder[SessionOut],
      stEnc: org.apache.spark.sql.Encoder[SessionState]): Dataset[SessionOut] = {
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start),
              new Timestamp(s.last), s.n))
          } else {
            val ts = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  // a late-but-admitted event may precede the current
                  // session start — extend both bounds
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, new Timestamp(s.start),
                    new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
