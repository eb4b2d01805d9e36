package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming sequential-pattern funnel — the streaming twin of
  * [[graft.ops.Relational.funnel]] on `transformWithState`, the shape a
  * 100 TB event pipeline actually runs (one pass over the live stream, no
  * nightly batch over all history).
  *
  * Semantics teach the design: a user's funnel result is FINAL once the
  * watermark passes `t1 + (nStages−1)·window` (t1 = first stage-0 event) —
  * after that horizon no admissible event can change any stage (a later
  * stage-i event would fall outside its window; an earlier one would be
  * watermark-late and dropped). So the processor accumulates the user's
  * funnel-type events in a [[ListState]], keeps one event-time timer at
  * that horizon, and emits a single `(user, reached)` row when it fires,
  * clearing the state. State per user is bounded by the horizon: events
  * retained only until `t1 + (nStages−1)·window` passes — the same
  * retention contract as a stream-stream interval join. Users with no
  * stage-0 event hold a GC timer at `last_seen + horizon` and emit nothing.
  *
  * Out-of-order safety inside the watermark: nothing is finalized early, so
  * any within-watermark reordering lands in the list before the timer
  * fires; the fold over the list is order-insensitive (per-stage minima).
  */
object StreamingFunnel {

  /** One funnel-relevant event in state: stage index + exact µs time. */
  case class Hit(idx: Int, ts_us: Long)

  /** Typed input row (watermark applied upstream on the DataFrame). */
  case class FunnelEvent(user_id: Long, type_idx: Int, ts_us: Long)

  /** Per-user result: highest 1-based stage reached (≥ 1 — stage-0-less
    * users emit nothing). */
  case class FunnelReach(user_id: Long, reached: Int)

  /** The funnel fold shared with the batch operator's semantics: stage i+1
    * = min event of type i+1 in `(t_i, t_i + winUs]`. Order-insensitive in
    * the input sequence. */
  def reachedOf(hits: Seq[Hit], nStages: Int, winUs: Long): Int = {
    var t = Long.MinValue
    var reached = 0
    var i = 0
    var blocked = false
    while (i < nStages && !blocked) {
      var best = Long.MaxValue
      val it = hits.iterator
      while (it.hasNext) {
        val h = it.next()
        if (h.idx == i && h.ts_us < best &&
            (i == 0 || (h.ts_us > t && h.ts_us <= t + winUs))) best = h.ts_us
      }
      if (best == Long.MaxValue) blocked = true
      else { t = best; reached += 1; i += 1 }
    }
    reached
  }
}

class FunnelProcessor(nStages: Int, winUs: Long)
    extends StatefulProcessor[Long, StreamingFunnel.FunnelEvent, StreamingFunnel.FunnelReach] {
  import StreamingFunnel._

  @transient private var hits: ListState[Hit] = _

  private def horizonMs: Long = (nStages - 1) * (winUs / 1000)

  /** Finality deadline: stage-0 horizon when a stage-0 event exists, else a
    * GC deadline off the latest event seen. The `+ 1` puts the deadline
    * strictly past the horizon's own millisecond. */
  private def deadlineMs(all: Seq[Hit]): Long = {
    var t1 = Long.MaxValue
    var last = Long.MinValue
    all.foreach { h =>
      if (h.idx == 0 && h.ts_us < t1) t1 = h.ts_us
      if (h.ts_us > last) last = h.ts_us
    }
    val anchor = if (t1 != Long.MaxValue) t1 else last
    anchor / 1000 + horizonMs + 1
  }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hits = getHandle.getListState[Hit]("hits", Encoders.product[Hit], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[FunnelEvent],
                               tv: TimerValues): Iterator[FunnelReach] = {
    rows.foreach(r => hits.appendValue(Hit(r.type_idx, r.ts_us)))
    val all = hits.get().toSeq
    // re-registered each batch; an earlier-deadline stale timer (e.g. the GC
    // deadline before the first stage-0 event arrived) is filtered at expiry
    if (all.nonEmpty) getHandle.registerTimer(deadlineMs(all))
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[FunnelReach] = {
    val all = hits.get().toSeq
    if (all.isEmpty) Iterator.empty // already emitted (a second timer fired)
    else if (info.getExpiryTimeInMs < deadlineMs(all)) Iterator.empty // stale
    else {
      hits.clear()
      val r = reachedOf(all, nStages, winUs)
      if (r >= 1) Iterator.single(FunnelReach(user, r)) else Iterator.empty
    }
  }
}
