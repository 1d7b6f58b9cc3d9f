package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming conversion funnel: the `flatMapGroupsWithState`
  * twin of [[graft.llm.Events.funnel]].
  *
  * State per user = the first qualifying timestamp of each stage seen
  * so far (−1 until reached — the same integer sentinels as the batch
  * operator). A completed funnel (purchase strictly after click
  * strictly after view) emits exactly once, at the event that
  * completes it; open funnels stay in state like PackStream's open
  * sequence and SessionStream's open session.
  *
  * Ordering contract (same family as the other stateful twins): a
  * user's events must arrive in timestamp order across micro-batches
  * (within a batch they are sorted here) — under that contract the
  * emitted completions are exactly the batch operator's stage-3 rows,
  * because the first view IS the minimum view, and each subsequent
  * first-qualifying event IS the strict-after minimum the batch
  * window picks.
  *
  * State is O(1) per user (three longs).
  */
object FunnelStream {

  case class Ev(user_id: Long, event_id: Long, event_type: String,
                ts_us: Long)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class Conversion(user_id: Long, t1_us: Long, t2_us: Long,
                        t3_us: Long)

  /** The per-user transition — pure, testable without a stream.
    * Timestamps must be non-negative (the −1 sentinel convention the
    * batch operator's output shares; a pre-epoch ts would alias the
    * unset marker) — enforced loudly rather than silently misfiled.
    */
  def updateUser(userId: Long, events: Iterator[Ev],
                 state: GroupState[FunnelState])
      : Iterator[Conversion] = {
    var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = List.newBuilder[Conversion]
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val (next, emitted) = advance(userId, st, e)
      st = next
      emitted.foreach(out += _)
    }
    state.update(st)
    out.result().iterator
  }

  /** Pure single-event transition — ONE definition shared by the
    * in-order twin and [[OooStream]]'s watermark-reordered variant.
    */
  def advance(userId: Long, st: FunnelState, e: Ev)
      : (FunnelState, Option[Conversion]) = {
    require(e.ts_us >= 0,
      s"funnel requires non-negative ts_us, got ${e.ts_us}")
    if (st.t3 >= 0) (st, None)
    else e.event_type match {
      case "view" if st.t1 < 0 =>
        (st.copy(t1 = e.ts_us), None)
      case "click" if st.t1 >= 0 && st.t2 < 0 && e.ts_us > st.t1 =>
        (st.copy(t2 = e.ts_us), None)
      case "purchase" if st.t2 >= 0 && e.ts_us > st.t2 =>
        val n = st.copy(t3 = e.ts_us)
        (n, Some(Conversion(userId, n.t1, n.t2, n.t3)))
      case _ => (st, None)
    }
  }

  /** Wire the stateful operator over a streaming Dataset[Ev]. */
  def conversions(events: Dataset[Ev]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateUser)
  }

  /** Streaming Dataset[Ev] from the events fixture (same ts
    * normalisation as the batch reader).
    */
  def evStream(spark: SparkSession, dir: String): Dataset[Ev] = {
    import spark.implicits._
    EventsStream.readEventsStream(spark, dir)
      .selectExpr("user_id", "event_id", "event_type", "ts_us")
      .as[Ev]
  }

  /** Drain the fixture once through the stream (memory sink). */
  def conversionsOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(conversions(evStream(spark, dir)),
      "funnel_stream")
}
