package graft

import graft.streaming.SessionStream
import graft.streaming.SessionStream.{Ev, SessionState}
import org.scalatest.funsuite.AnyFunSuite

/** The stateful transition function is pure — test it directly (the
  * Spark wiring is one flatMapGroupsWithState call), including the
  * session-splitting and ordering guarantees that make the stream agree
  * with the batch operator on closed sessions.
  */
class SessionStreamSpec extends AnyFunSuite {

  private class FakeState(var v: Option[SessionState])
      extends org.apache.spark.sql.streaming.GroupState[SessionState] {
    var removed = false
    var timeout: String = ""
    override def exists: Boolean = v.isDefined
    override def get: SessionState = v.get
    override def getOption: Option[SessionState] = v
    override def update(s: SessionState): Unit = { v = Some(s) }
    override def remove(): Unit = { v = None; removed = true }
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = {}
    override def setTimeoutDuration(d: String): Unit = { timeout = d }
    override def setTimeoutTimestamp(t: Long): Unit = {}
    override def setTimeoutTimestamp(t: Long, add: String): Unit = {}
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = {}
    override def setTimeoutTimestamp(t: java.sql.Date,
                                     add: String): Unit = {}
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  val gap: Long = SessionStream.GapUs

  test("events within the gap extend the open session") {
    val st = new FakeState(None)
    val out = SessionStream.updateUser(1L,
      Iterator(Ev(1, 1, 0), Ev(1, 2, gap / 2), Ev(1, 3, gap)),
      st).toList
    assert(out.isEmpty) // still open
    assert(st.v.contains(SessionState(0, gap, 3)))
  }

  test("a gap closes the session and opens a new one") {
    val st = new FakeState(None)
    val out = SessionStream.updateUser(1L,
      Iterator(Ev(1, 1, 0), Ev(1, 2, 10), Ev(1, 3, 10 + gap + 1)),
      st).toList
    assert(out.map(s => (s.start_us, s.end_us, s.n_events)) ==
      List((0L, 10L, 2L)))
    assert(st.v.contains(SessionState(10 + gap + 1, 10 + gap + 1, 1)))
  }

  test("out-of-order micro-batch events are sorted before applying") {
    val st = new FakeState(None)
    SessionStream.updateUser(1L,
      Iterator(Ev(1, 2, 100), Ev(1, 1, 0)), st).toList
    assert(st.v.contains(SessionState(0, 100, 2)))
  }
}
