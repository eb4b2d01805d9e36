package graft.streaming

import graft.SparkSpec
import StatefulSessionizer._

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  test("advance folds events into gap-separated sessions") {
    val (open, closed) = advance(100L, None,
      Seq(Event(1, 0), Event(1, 50), Event(1, 120), Event(1, 400), Event(1, 450)))
    assert(closed == Seq(Session(1, 0, 120, 3)))
    assert(open.contains(SessionState(400, 450, 2)))
  }

  test("advance resumes from carried state") {
    val (open, closed) = advance(100L, Some(SessionState(0, 50, 2)),
      Seq(Event(1, 100), Event(1, 500)))
    assert(closed == Seq(Session(1, 0, 100, 3)))
    assert(open.contains(SessionState(500, 500, 1)))
  }

  test("sessionize over a typed Dataset (batch flatMapGroupsWithState path)") {
    val gap = 3600000000L // 1h
    val events = graft.sources.Tables.eventsUs(spark, sf001)
      .selectExpr("user_id", "ts_us").as[Event]
    val sessions = sessionize(events, gap).collect()
    assert(sessions.nonEmpty)
    // sessions are disjoint and ordered per user, and cover all events
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.start_us).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.end_us + gap < b.start_us)
        case _ =>
      }
    }
    assert(sessions.map(_.n_events.toLong).sum == events.count())
  }
}
