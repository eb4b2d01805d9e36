package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the arbitrary
  * stateful-processing extension point (KeyValueGroupedDataset) for session
  * semantics that watermark joins can't express: here, gap-based sessions
  * (a session closes after `gapUs` of inactivity), vs the reference's
  * start/stop event pairing (J4).
  *
  * State per key is O(open sessions) = O(1) in size, but entries for idle
  * keys live until a timeout closes them: in streaming use pass
  * `GroupStateTimeout.ProcessingTimeTimeout` so the store self-cleans (the
  * timed-out open session is emitted as closed and removed). With the
  * default `NoTimeout` (the batch path, where each group is processed
  * exactly once) state death is irrelevant. Works identically over a
  * bounded Dataset in unit tests (batch `flatMapGroupsWithState` path).
  *
  * Note for Append-mode streaming sinks: `emitOpen=true` re-emits the still-
  * open session each batch with a growing `end_us`; set `emitOpen=false`
  * for exactly-once session rows and rely on the timeout to flush tails.
  */
object StatefulSessionizer {

  case class Event(user_id: Long, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n_events: Int)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Pure per-group logic: fold sorted events into gap-separated sessions,
    * emitting closed ones and carrying the open one in state. */
  def advance(gapUs: Long, state: Option[SessionState], events: Seq[Event]):
      (Option[SessionState], Seq[Session]) = {
    val sorted = events.sortBy(_.ts_us)
    var cur = state
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.last_us <= gapUs =>
          cur = Some(s.copy(last_us = e.ts_us, n_events = s.n_events + 1))
        case Some(s) =>
          closed += Session(e.user_id, s.start_us, s.last_us, s.n_events)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    (cur, closed.result())
  }

  /** Sessionize a (possibly streaming) typed event Dataset. In streaming use,
    * pair with a watermark on the event-time column and ProcessingTime/
    * EventTime timeouts; in batch the state machine runs once per key. */
  def sessionize(events: Dataset[Event], gapUs: Long,
                 emitOpen: Boolean = true,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
                 timeoutMs: Long = 0L): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[SessionState]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // flush the idle open session and free the state entry
            val flushed = Option(state.get).toSeq
              .map(s => Session(user, s.start_us, s.last_us, s.n_events))
            state.remove()
            flushed.iterator
          } else {
            val (open, closed) = advance(gapUs,
              if (state.exists) Some(state.get) else None, it.toSeq)
            open match {
              case Some(s) =>
                state.update(s)
                if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
              case None => if (state.exists) state.remove()
            }
            val tail = if (emitOpen) open.toSeq.map(s =>
              Session(user, s.start_us, s.last_us, s.n_events)) else Seq.empty
            (closed ++ tail).iterator
          }
      }
  }
}
