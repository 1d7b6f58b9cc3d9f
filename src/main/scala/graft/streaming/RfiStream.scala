package graft.streaming

import graft.ops.{RfiCell, RfiFlagOut, RfiFlag, RfiStrategy}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming RFI detection: the `flatMapGroupsWithState`
  * twin of graft.ops.RfiFlag — AOFlagger-class detection running
  * continuously over an unbounded visibility stream, the real-time
  * flagging mode an ingesting telescope pipeline needs (the reference
  * engine is strictly batch, SURVEY §2.9).
  *
  * State per baseline = the cells of the most recent `window` distinct
  * timesteps (bounded: `window · nChans` cells). When a micro-batch
  * advances a baseline's newest timestep, every buffered timestep
  * older than `maxT − window + 1` EXITS the window: detection runs
  * once over the full buffer (exiting rows keep their trailing
  * context) via [[RfiFlag.detectGroup]] — the SAME kernel object the
  * batch operator runs, so streaming and batch use one code path —
  * and only the exiting cells are emitted. Rows are emitted exactly
  * once: when they can no longer gain context.
  *
  * Parity contract (spec-gated): emitted rows + [[openFlags]] over
  * the final state equal the batch operator exactly when the window
  * covers the data. A timestep emitted mid-stream sees only its
  * trailing `window` of context where the batch operator sees the
  * whole observation — the documented real-time tradeoff (identical
  * to running AOFlagger on bounded chunks).
  */
object RfiStream {

  /** `frontierT` is the oldest timestep the window still admits —
    * monotone; a cell arriving below it is LATE BEYOND THE WINDOW
    * (its timestep already exited and was emitted), so it is dropped
    * and counted rather than re-emitted with a truncated context
    * (which would both duplicate the (t, chan) emission and flag it
    * against less background than the first pass saw).
    */
  case class Buf(cells: Seq[RfiCell], frontierT: Long)

  /** Pure per-baseline transition: buffer, detect, emit exiting rows.
    * `lateDrops` (when given) counts the beyond-window arrivals — the
    * visible drop metric the out-of-order specs assert on.
    */
  def updateBl(bl: Long, newRows: Iterator[RfiCell],
               state: GroupState[Buf], window: Long,
               strategy: RfiStrategy,
               lateDrops: Option[org.apache.spark.util.LongAccumulator]
                 = None): Iterator[RfiFlagOut] = {
    if (state.hasTimedOut) {
      val flushed = state.getOption.map(b =>
        openFlags(bl, b, strategy)).getOrElse(Iterator.empty)
      state.remove()
      return flushed
    }
    val st0 = state.getOption.getOrElse(Buf(Seq.empty, Long.MinValue))
    val (late, fresh) = newRows.toSeq.partition(_.t < st0.frontierT)
    if (late.nonEmpty) lateDrops.foreach(_.add(late.size.toLong))
    val all = st0.cells ++ fresh
    if (all.isEmpty) return Iterator.empty
    val maxT = all.iterator.map(_.t).max
    val cutoff = math.max(maxT - window + 1, st0.frontierT)
    val (keep, exit) = all.partition(_.t >= cutoff)
    state.update(Buf(keep, cutoff))
    if (exit.isEmpty) Iterator.empty
    else {
      // detect over the FULL buffer so exiting rows keep their
      // trailing context; emit only the rows leaving the window
      val exitKeys = exit.map(c => (c.t, c.chan)).toSet
      RfiFlag.detectGroup(bl, all.toArray, strategy)
        .filter(o => exitKeys.contains((o.t, o.chan)))
    }
  }

  /** Detection over a baseline's still-buffered cells — the rows a
    * batch backfill would also contain; exposed so tests (and a
    * terminal flush) can complete the parity set.
    */
  def openFlags(bl: Long, buf: Buf,
                strategy: RfiStrategy): Iterator[RfiFlagOut] =
    RfiFlag.detectGroup(bl, buf.cells.toArray, strategy)

  /** Wire the stateful operator over a streaming Dataset[RfiCell].
    * `idleFlushMs = Some(ms)` opts into a processing-time idle flush
    * (a quiet baseline's buffered rows are detected and emitted, state
    * dropped) — same liveness/exactly-once tradeoff as
    * [[ResampleStream.resample]].
    */
  def flags(cells: Dataset[RfiCell], window: Long,
            strategy: RfiStrategy = RfiStrategy(),
            idleFlushMs: Option[Long] = None,
            lateDrops: Option[org.apache.spark.util.LongAccumulator]
              = None): Dataset[RfiFlagOut] = {
    import cells.sparkSession.implicits._
    val timeout =
      if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    cells
      .groupByKey(_.bl)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (bl: Long, rows: Iterator[RfiCell], st: GroupState[Buf]) => {
          val out = updateBl(bl, rows, st, window, strategy, lateDrops)
          idleFlushMs.foreach(ms =>
            if (st.exists) st.setTimeoutDuration(ms))
          out
        })
  }
}
