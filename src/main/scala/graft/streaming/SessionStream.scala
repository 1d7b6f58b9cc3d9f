package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionisation: the
  * `flatMapGroupsWithState` twin of graft.llm.Events.sessionize.
  *
  * State per user = the open session (start, last-seen, count). An
  * event more than `GapUs` after the last closes the open session
  * (emitting it) and opens a new one. Gap-closed sessions carry exactly
  * the fields of the batch operator, so a batch backfill agrees with
  * the stream on every session closed BY A GAP; the processing-time
  * timeout (set to the same 30 min) additionally flushes the open
  * session of a user who goes quiet — a streaming liveness tradeoff
  * the batch operator, which sees the whole history, does not need.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionState(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, duration_us: Long)

  val GapUs: Long = 1800L * 1000000L

  /** The open session materialised as an emitted row. */
  def closeSession(userId: Long, s: SessionState): Session =
    Session(userId, s.startUs, s.endUs, s.n, s.endUs - s.startUs)

  /** Pure single-event transition: fold `e` into the open session,
    * emitting the closed session when the gap splits. ONE definition
    * shared by the in-order twin and [[OooStream]]'s
    * watermark-reordered variant, so the two paths cannot drift.
    */
  def advance(userId: Long, cur: Option[SessionState], e: Ev)
      : (Option[SessionState], Option[Session]) = cur match {
    case Some(s) if e.ts_us - s.endUs <= GapUs =>
      (Some(s.copy(endUs = e.ts_us, n = s.n + 1)), None)
    case Some(s) =>
      (Some(SessionState(e.ts_us, e.ts_us, 1)),
        Some(closeSession(userId, s)))
    case None =>
      (Some(SessionState(e.ts_us, e.ts_us, 1)), None)
  }

  /** The per-group state transition — pure, testable without a stream. */
  def updateUser(userId: Long, events: Iterator[Ev],
                 state: GroupState[SessionState]): Iterator[Session] = {
    var closed = List.empty[Session]
    var cur = state.getOption
    // deterministic order within the micro-batch
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val (next, emitted) = advance(userId, cur, e)
      cur = next
      emitted.foreach(closed ::= _)
    }
    if (state.hasTimedOut) {
      cur.foreach(s => closed ::= closeSession(userId, s))
      state.remove()
    } else {
      cur.foreach(state.update)
      // timeout aligned with the session gap: an idle user's open
      // session closes only after the same 30 min that would split it
      state.setTimeoutDuration("30 minutes")
    }
    closed.reverseIterator
  }

  /** Wire the stateful operator over a streaming Dataset[Ev]. */
  def sessions(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(updateUser)
  }
}
