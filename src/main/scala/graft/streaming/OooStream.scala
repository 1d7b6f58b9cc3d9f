package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Out-of-order-tolerant variants of the stateful streaming twins
  * (sessions / funnel / resample).
  *
  * The in-order twins pin batch parity under an in-order-arrival
  * contract (each spec's documented caveat). Real streams deliver
  * out of order, so each variant here fronts the SAME pure
  * single-event fold (`SessionStream.advance` /
  * `FunnelStream.advance` / `ResampleStream.advance` — one
  * definition, no drift) with an event-time watermark reorder
  * buffer:
  *
  *  - the source declares `withWatermark(ts, lateness)`;
  *  - arriving events are BUFFERED in state; only events whose
  *    event-time has fallen at or below the group's current
  *    watermark are folded — in (ts_us, event_id) order — so ANY
  *    arrival permutation within the allowed lateness produces
  *    bit-identical output (spec-gated per twin);
  *  - an event arriving after the watermark already passed its
  *    timestamp ("late beyond lateness") is dropped and COUNTED via
  *    the caller's accumulator — never silently folded out of order.
  *    (Spark's own stateful-operator watermark filter may drop such
  *    rows before the function; the in-function frontier makes the
  *    guarantee independent of that engine detail, and the engine's
  *    `numRowsDroppedByWatermark` metric stays visible either way.)
  *
  * State per group = the O(lateness·rate) pending buffer + the
  * in-order twin's O(1) state + the monotone frontier. EventTime
  * timeouts flush a group once the watermark passes its horizon:
  *
  *  - sessions/resample DRAIN pending and CLOSE the open aggregate
  *    (a session/bucket past the watermark is closable), then remove
  *    the state. Removal forgets the frontier: a straggler arriving
  *    after the flush is caught only by Spark's operator-level
  *    watermark filter (counted in `numRowsDroppedByWatermark`), not
  *    by the in-function counter — the same liveness/exactly-once
  *    tradeoff as ResampleStream's idle flush, accepted here because
  *    a retained tombstone per ever-seen group would grow state with
  *    the key cardinality of the whole stream, not the live window.
  *  - the funnel has NO closable aggregate: a partial FunnelState
  *    (view seen, purchase still to come — nothing late) must survive
  *    the flush or the conversion is silently lost. Its timeout
  *    drains pending but RETAINS the folded O(1) state + frontier —
  *    exactly what the in-order twin keeps forever under NoTimeout —
  *    so funnels spanning micro-batches convert, and post-flush
  *    stragglers still hit the in-function lateness counter.
  *
  * Scale shape: identical to the in-order twins — one stateful
  * exchange on the group key; the buffer adds memory bounded by the
  * lateness window, not the stream length.
  */
object OooStream {

  /** Split (pending ++ arrivals) on the watermark frontier:
    * (ready — sorted, still-pending, late-beyond-lateness).
    */
  private def frontierSplit[E](pending: Seq[E], arrivals: Seq[E],
                               frontierUs: Long, wmUs: Long,
                               ts: E => Long, tie: E => Long)
      : (Seq[E], Seq[E], Seq[E]) = {
    val (late, fresh) = arrivals.partition(e => ts(e) < frontierUs)
    val all = pending ++ fresh
    val (ready, hold) = all.partition(e => ts(e) <= wmUs)
    (ready.sortBy(e => (ts(e), tie(e))), hold, late)
  }

  // ---- sessionisation -------------------------------------------------

  /** SessionStream.Ev + the event-time column the watermark needs. */
  case class TSev(user_id: Long, event_id: Long, ts_us: Long,
                  ts: java.sql.Timestamp)
  case class SessOoo(pending: Seq[SessionStream.Ev],
                     open: Option[SessionStream.SessionState],
                     frontierUs: Long)

  private[streaming] def sessUpdate(drops: Option[LongAccumulator])
      (userId: Long, events: Iterator[TSev],
       state: GroupState[SessOoo])
      : Iterator[SessionStream.Session] = {
    val st0 = state.getOption.getOrElse(
      SessOoo(Seq.empty, None, Long.MinValue))
    val out = List.newBuilder[SessionStream.Session]
    if (state.hasTimedOut) {
      // watermark passed the flush horizon: drain pending in order,
      // close the open session
      var open = st0.open
      st0.pending.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val (next, emitted) = SessionStream.advance(userId, open, e)
        open = next
        emitted.foreach(out += _)
      }
      open.foreach(s => out += SessionStream.closeSession(userId, s))
      state.remove()
      return out.result().iterator
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val arrivals = events
      .map(t => SessionStream.Ev(t.user_id, t.event_id, t.ts_us)).toSeq
    val (ready, hold, late) = frontierSplit(st0.pending, arrivals,
      st0.frontierUs, wmUs, (_: SessionStream.Ev).ts_us,
      (_: SessionStream.Ev).event_id)
    if (late.nonEmpty) drops.foreach(_.add(late.size.toLong))
    var open = st0.open
    ready.foreach { e =>
      val (next, emitted) = SessionStream.advance(userId, open, e)
      open = next
      emitted.foreach(out += _)
    }
    state.update(SessOoo(hold, open, math.max(st0.frontierUs, wmUs + 1)))
    // flush once the watermark passes everything this group may still
    // owe: the newest pending/open time plus the session gap
    val horizonUs = (hold.map(_.ts_us) ++ open.map(_.endUs))
      .foldLeft(wmUs)(math.max) + SessionStream.GapUs
    state.setTimeoutTimestamp(horizonUs / 1000L + 1L)
    out.result().iterator
  }

  /** Watermark-reordered sessionisation over an event-time stream.
    * `lateness` is the tolerated disorder (the watermark delay).
    */
  def sessions(events: Dataset[SessionStream.Ev], latenessSec: Long,
               drops: Option[LongAccumulator] = None)
      : Dataset[SessionStream.Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[TSev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessUpdate(drops))
  }

  // ---- conversion funnel ----------------------------------------------

  case class TFev(user_id: Long, event_id: Long, event_type: String,
                  ts_us: Long, ts: java.sql.Timestamp)
  case class FunOoo(pending: Seq[FunnelStream.Ev],
                    st: FunnelStream.FunnelState, frontierUs: Long)

  private[streaming] def funUpdate(drops: Option[LongAccumulator])
      (userId: Long, events: Iterator[TFev],
       state: GroupState[FunOoo])
      : Iterator[FunnelStream.Conversion] = {
    val st0 = state.getOption.getOrElse(FunOoo(Seq.empty,
      FunnelStream.FunnelState(-1L, -1L, -1L), Long.MinValue))
    val out = List.newBuilder[FunnelStream.Conversion]
    if (state.hasTimedOut) {
      var st = st0.st
      st0.pending.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val (next, emitted) = FunnelStream.advance(userId, st, e)
        st = next
        emitted.foreach(out += _)
      }
      // no closable aggregate to emit: removing the state here would
      // lose a partial funnel whose remaining stages arrive in later
      // micro-batches with nothing late (the timeout fires on the
      // next watermark advance while the buffer sits empty). Retain
      // the folded O(1) state — the in-order twin keeps it forever
      // under NoTimeout — plus the advanced frontier; no new timeout
      // is armed (nothing pending), the next arrival re-arms one.
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      state.update(FunOoo(Seq.empty, st,
        math.max(st0.frontierUs, wmUs + 1)))
      return out.result().iterator
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val arrivals = events.map(t =>
      FunnelStream.Ev(t.user_id, t.event_id, t.event_type, t.ts_us))
      .toSeq
    val (ready, hold, late) = frontierSplit(st0.pending, arrivals,
      st0.frontierUs, wmUs, (_: FunnelStream.Ev).ts_us,
      (_: FunnelStream.Ev).event_id)
    if (late.nonEmpty) drops.foreach(_.add(late.size.toLong))
    var st = st0.st
    ready.foreach { e =>
      val (next, emitted) = FunnelStream.advance(userId, st, e)
      st = next
      emitted.foreach(out += _)
    }
    state.update(FunOoo(hold, st, math.max(st0.frontierUs, wmUs + 1)))
    // arm a flush only when something is actually buffered — an idle
    // partial funnel just persists (a stale timeout from an earlier
    // batch may still fire; the handler then drains nothing and
    // re-stores the state, harmless)
    if (hold.nonEmpty) {
      val horizonUs = hold.map(_.ts_us).max + 1L
      state.setTimeoutTimestamp(horizonUs / 1000L + 1L)
    }
    out.result().iterator
  }

  def conversions(events: Dataset[FunnelStream.Ev], latenessSec: Long,
                  drops: Option[LongAccumulator] = None)
      : Dataset[FunnelStream.Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[TFev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(funUpdate(drops))
  }

  // ---- sequence packing -------------------------------------------------

  /** PackStream.Doc + event time. Packing is order-SENSITIVE by
    * construction (running offsets), so the watermark contract here is
    * the strongest of the family: documents are folded strictly in
    * (ts_us, doc_id) order once their event time falls at or below the
    * watermark — any arrival permutation within the lateness packs
    * bit-identically. The batch twin's doc_id ordering is recovered
    * whenever event time is doc_id-monotone per source (shard-ordered
    * ingestion), which is the parity the spec pins.
    */
  case class TPdoc(source: String, doc_id: Long, n_tok: Long,
                   ts_us: Long, ts: java.sql.Timestamp)
  case class PackEv(source: String, doc_id: Long, n_tok: Long,
                    ts_us: Long)
  case class PackOoo(pending: Seq[PackEv], st: PackStream.PackState,
                     frontierUs: Long)

  private[streaming] def packUpdate(budget: Long,
                                    drops: Option[LongAccumulator])
      (source: String, events: Iterator[TPdoc],
       state: GroupState[PackOoo])
      : Iterator[PackStream.Packed] = {
    val st0 = state.getOption.getOrElse(
      PackOoo(Seq.empty, PackStream.PackState(0L, 0L, 0L),
        Long.MinValue))
    val out = List.newBuilder[PackStream.Packed]
    if (state.hasTimedOut) {
      var st = st0.st
      st0.pending.sortBy(e => (e.ts_us, e.doc_id)).foreach { e =>
        val (next, emitted) = PackStream.advance(budget)(source, st,
          PackStream.Doc(source, e.doc_id, e.n_tok))
        st = next
        out ++= emitted
      }
      // the running offsets are PERMANENT per-source state (the next
      // shard continues the token stream) — retain them plus the
      // frontier, exactly the funnel rule; no new timeout is armed
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      state.update(PackOoo(Seq.empty, st,
        math.max(st0.frontierUs, wmUs + 1)))
      return out.result().iterator
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val arrivals = events
      .map(t => PackEv(t.source, t.doc_id, t.n_tok, t.ts_us)).toSeq
    val (ready, hold, late) = frontierSplit(st0.pending, arrivals,
      st0.frontierUs, wmUs, (_: PackEv).ts_us, (_: PackEv).doc_id)
    if (late.nonEmpty) drops.foreach(_.add(late.size.toLong))
    var st = st0.st
    ready.foreach { e =>
      val (next, emitted) = PackStream.advance(budget)(source, st,
        PackStream.Doc(source, e.doc_id, e.n_tok))
      st = next
      out ++= emitted
    }
    state.update(PackOoo(hold, st, math.max(st0.frontierUs, wmUs + 1)))
    if (hold.nonEmpty)
      state.setTimeoutTimestamp((hold.map(_.ts_us).max + 1L) / 1000L + 1L)
    out.result().iterator
  }

  /** Watermark-reordered sequence packing over an event-time stream. */
  def packed(docs: Dataset[PackEv], budget: Long, latenessSec: Long,
             drops: Option[LongAccumulator] = None)
      : Dataset[PackStream.Packed] = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[TPdoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(packUpdate(budget, drops))
  }

  // ---- first-wins exact dedup ---------------------------------------------

  /** The in-order twin (DedupStream's `dropDuplicates`) keeps the
    * ARRIVAL-first row per content hash — under disorder that is the
    * wrong winner. This variant defines the winner as the event-time
    * minimum within the lateness: min (ts_us, event_id) per hash,
    * emitted once its timestamp falls at or below the watermark.
    * State per hash is the pending buffer while in flight, then the
    * O(1) emitted flag + frontier FOREVER — the same unbounded-store
    * invariant the in-order twin's dropDuplicates (and the batch hash
    * aggregate) already holds; the bounded alternative is the Bloom
    * screen ([[DedupStream.bloomProbeStream]]).
    */
  case class DEv(content_hash: String, event_id: Long, ts_us: Long)
  case class TDev(content_hash: String, event_id: Long, ts_us: Long,
                  ts: java.sql.Timestamp)
  case class DedupEv(event_id: Long, ts_us: Long)
  case class DedupOoo(pending: Seq[DedupEv], emitted: Boolean,
                      frontierUs: Long)
  case class Winner(content_hash: String, event_id: Long, ts_us: Long)

  private[streaming] def dedupUpdate(drops: Option[LongAccumulator])
      (hash: String, events: Iterator[TDev],
       state: GroupState[DedupOoo])
      : Iterator[Winner] = {
    val st0 = state.getOption.getOrElse(
      DedupOoo(Seq.empty, emitted = false, Long.MinValue))
    val out = List.newBuilder[Winner]
    def fold(ready: Seq[DedupEv], emitted: Boolean): Boolean = {
      var em = emitted
      ready.foreach { e =>
        if (!em) { out += Winner(hash, e.event_id, e.ts_us); em = true }
        // em == true: a within-lateness duplicate, dropped by
        // DEFINITION of dedup — not a late drop, not counted
      }
      em
    }
    if (state.hasTimedOut) {
      val em = fold(st0.pending.sortBy(e => (e.ts_us, e.event_id)),
        st0.emitted)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // emitted flag + frontier persist forever (see scaladoc)
      state.update(DedupOoo(Seq.empty, em,
        math.max(st0.frontierUs, wmUs + 1)))
      return out.result().iterator
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val arrivals = events
      .map(t => DedupEv(t.event_id, t.ts_us)).toSeq
    val (ready, hold, late) = frontierSplit(st0.pending, arrivals,
      st0.frontierUs, wmUs, (_: DedupEv).ts_us, (_: DedupEv).event_id)
    if (late.nonEmpty) drops.foreach(_.add(late.size.toLong))
    val em = fold(ready, st0.emitted)
    state.update(DedupOoo(hold, em, math.max(st0.frontierUs, wmUs + 1)))
    if (hold.nonEmpty)
      state.setTimeoutTimestamp((hold.map(_.ts_us).max + 1L) / 1000L + 1L)
    out.result().iterator
  }

  /** Watermark-reordered first-wins dedup over an event-time stream:
    * one Winner row per content hash, the (ts_us, event_id) minimum
    * within the allowed lateness.
    */
  def firstWins(events: Dataset[DEv], latenessSec: Long,
                drops: Option[LongAccumulator] = None)
      : Dataset[Winner] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[TDev]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(dedupUpdate(drops))
  }

  // ---- resample + forward fill ------------------------------------------

  case class TRev(user_id: Long, event_id: Long, ts_us: Long,
                  value: Double, ts: java.sql.Timestamp)
  case class ResOoo(pending: Seq[ResampleStream.Ev],
                    open: Option[ResampleStream.BucketState],
                    frontierUs: Long)

  private[streaming] def resUpdate(drops: Option[LongAccumulator])
      (userId: Long, events: Iterator[TRev],
       state: GroupState[ResOoo])
      : Iterator[ResampleStream.Bucket] = {
    val st0 = state.getOption.getOrElse(
      ResOoo(Seq.empty, None, Long.MinValue))
    val out = List.newBuilder[ResampleStream.Bucket]
    if (state.hasTimedOut) {
      var open = st0.open
      st0.pending.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val (next, emitted) = ResampleStream.advance(userId, open, e)
        open = next
        out ++= emitted
      }
      open.foreach(s => out += ResampleStream.openBucket(s, userId))
      state.remove()
      return out.result().iterator
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val arrivals = events.map(t =>
      ResampleStream.Ev(t.user_id, t.event_id, t.ts_us, t.value)).toSeq
    val (ready, hold, late) = frontierSplit(st0.pending, arrivals,
      st0.frontierUs, wmUs, (_: ResampleStream.Ev).ts_us,
      (_: ResampleStream.Ev).event_id)
    if (late.nonEmpty) drops.foreach(_.add(late.size.toLong))
    var open = st0.open
    ready.foreach { e =>
      val (next, emitted) = ResampleStream.advance(userId, open, e)
      open = next
      out ++= emitted
    }
    state.update(ResOoo(hold, open, math.max(st0.frontierUs, wmUs + 1)))
    val horizonUs = (hold.map(_.ts_us) ++
      open.map(s => (s.bucketS + ResampleStream.BucketSec) * 1000000L))
      .foldLeft(wmUs)(math.max)
    state.setTimeoutTimestamp(horizonUs / 1000L + 1L)
    out.result().iterator
  }

  def resample(events: Dataset[ResampleStream.Ev], latenessSec: Long,
               drops: Option[LongAccumulator] = None)
      : Dataset[ResampleStream.Bucket] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[TRev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(resUpdate(drops))
  }
}
