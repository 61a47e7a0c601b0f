package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state — the
  * `flatMapGroupsWithState` member of the streaming surface (the reference
  * has no streaming at all; this is the canonical "user session" operator a
  * clickstream/training-data pipeline needs).
  *
  * State per user is O(1) (bounds, count, sum — never the events), the
  * timeout is event-time driven off the watermark, and closed sessions are
  * emitted in append mode, so the operator runs unbounded with bounded
  * memory — the property that matters at 100 TB/day ingest.
  */
object Sessionize {

  case class Click(user_id: Long, ts: Timestamp, value: Double)

  case class SessionAgg(start: Long, last: Long, n: Long, total: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  /** Close a session after `gapSeconds` of event-time silence per user. */
  def sessionize(clicks: Dataset[Click], gapSeconds: Long,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    val gapMs = gapSeconds * 1000L
    implicit val stateEnc = Encoders.product[SessionAgg]
    implicit val outEnc = Encoders.product[Session]

    clicks
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, events: Iterator[Click], state: GroupState[SessionAgg]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            // fold the batch's events in time order onto the open session,
            // closing (and emitting) a session whenever a gap appears — a
            // timeout isn't the only way a session ends: a later event in
            // the same or a following batch can prove the gap passed
            var closed = List.empty[SessionAgg]
            var cur = state.getOption
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed ::= s
                  Some(SessionAgg(t, t, 1L, e.value))
                case Some(s) =>
                  Some(SessionAgg(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case None =>
                  Some(SessionAgg(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the open session closes when the watermark passes last + gap.
              // Clamp: a late-but-within-watermark event can leave last + gap
              // at or before the current watermark, and Spark throws on a
              // timeout that isn't strictly in the event-time future — such a
              // session times out on the very next trigger instead of crashing
              // the query.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator.map(s =>
              Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          }
        })
  }
}
