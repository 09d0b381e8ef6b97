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

  /** Sliding-window distinct active users — the streaming twin of the
    * batch rolling-actives report (operators.Events ev12): every event
    * lands in `width`/`slide` sliding event-time windows, per-(window,
    * user) membership collapses in a FIRST stateful aggregation, and a
    * second chained windowed aggregation counts the deduped members —
    * Spark's multiple-stateful-operator support (the window column
    * carries event-time lineage between the two, so both evict on the
    * same watermark). State is bounded at (windows in horizon) x (active
    * users), never raw events; append mode emits each window exactly
    * once when the watermark passes its end. A window [s, s+width)
    * corresponds to batch ev12's day s+width-1 (trailing-window form),
    * which the spec pins on the real events fixture. */
  def rollingActives(events: DataFrame, width: String = "7 days",
      slide: String = "1 day", lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width, slide).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("active_users"))

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

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelHit(user_id: Long, stage: String, ts: Timestamp)
  /** buffered = (ts, type) events not yet finalized by the watermark;
    * tSignup/tClick/tPurchase = completed-stage timestamps. */
  case class FunnelState(buffered: List[(Long, String)],
      tSignup: Option[Long], tClick: Option[Long], tPurchase: Option[Long])

  private val StagePrio = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)

  /** Streaming funnel — the exact streaming twin of the batch ev08 query
    * (signup -> first click at/after it -> first purchase at/after that).
    * Emits one append-mode [[FunnelHit]] per user per completed stage,
    * with the stage timestamp equal to the batch definition's t_signup /
    * t_click / t_purchase.
    *
    * Exactness under out-of-order arrival: the batch semantics compare
    * global minima (a click qualifies iff ts >= the user's EARLIEST
    * signup), so events must be applied in event-time order. Each
    * micro-batch buffers arrivals in state and applies only events
    * finalized by the watermark (ts < wm), sorted by (ts, stage-priority)
    * — the priority tie-break reproduces the batch `>=` on equal
    * timestamps. An event-time timeout set to the earliest buffered ts
    * drains the buffer as the watermark advances even if the user goes
    * quiet. State is bounded: the buffer holds at most one watermark
    * horizon of a single user's events, plus three scalars — and the
    * scalars are the same O(users) a batch groupBy holds (production
    * deployments expire idle users with a TTL on top).
    */
  def funnel(events: Dataset[FunnelEvent], lateness: String = "10 minutes")(
      implicit hitEnc: org.apache.spark.sql.Encoder[FunnelHit],
      stEnc: org.apache.spark.sql.Encoder[FunnelState]): Dataset[FunnelHit] = {
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelState(Nil, None, None, None))
          val incoming = rows
            .map(e => (e.ts.getTime, e.event_type))
            .filter(e => StagePrio.contains(e._2))
            .toList
          val wm = state.getCurrentWatermarkMs()
          val all = st0.buffered ++ incoming
          val (ripe, pending) = all.partition(_._1 < wm)
          var (tS, tC, tP) = (st0.tSignup, st0.tClick, st0.tPurchase)
          val hits = List.newBuilder[FunnelHit]
          ripe.sortBy(e => (e._1, StagePrio(e._2))).foreach { case (t, typ) =>
            typ match {
              case "signup" if tS.isEmpty =>
                tS = Some(t); hits += FunnelHit(user, "signup", new Timestamp(t))
              case "click" if tC.isEmpty && tS.isDefined =>
                tC = Some(t); hits += FunnelHit(user, "click_after", new Timestamp(t))
              case "purchase" if tP.isEmpty && tC.isDefined =>
                tP = Some(t); hits += FunnelHit(user, "purchase_after", new Timestamp(t))
              case _ => ()
            }
          }
          state.update(FunnelState(pending, tS, tC, tP))
          // Spark rejects non-positive timeout timestamps: an event AT the
          // epoch (ts == 0) would otherwise crash the whole query. Events
          // before the watermark's origin are out of the operator's
          // event-time contract anyway; clamping to 1 ms only affects
          // when the drain fires, never what it computes.
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(1L, pending.map(_._1).min))
          hits.result().iterator
      }
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
