package graft

import graft.ops.{RfiCell, RfiStrategy}
import graft.streaming.{FunnelStream, OooStream, PackStream, ResampleStream, RfiStream, SessionStream}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Out-of-order arrival robustness of the stateful streaming twins:
  * for each of sessions / funnel / resample (watermark-reordered
  * variants in [[OooStream]]) and RFI (window-frontier in
  * [[RfiStream]]), the specs pin
  *
  *   1. shuffled-arrival PARITY — the same events delivered in a
  *      permuted order (disorder bounded by the allowed lateness)
  *      produce bit-identical output to in-order delivery;
  *   2. late-beyond-lateness rows are DROPPED AND COUNTED (either by
  *      the in-function frontier via the caller's accumulator, or by
  *      the engine's own watermark filter, whose
  *      numRowsDroppedByWatermark metric the spec reads) — never
  *      silently folded out of order.
  *
  * The in-order twins keep their documented in-order contract; these
  * variants are what a deployment fronts a disordered source with.
  */
class OooStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** All scenario times sit on a base far from the epoch (and
    * divisible by the resample bucket width): Spark's stateful
    * operators DROP input rows whose event time is not strictly above
    * the current watermark (initially 0), so an event at the epoch
    * edge would be engine-filtered before the reorder buffer ever saw
    * it. The engine's drops are part of the visible count (the drain
    * helper folds numRowsDroppedByWatermark into the accumulator), so
    * the within-lateness feeds below are built to arrive strictly
    * above the watermark — exactly the contract a real source that
    * respects the declared lateness satisfies.
    */
  private val BaseSec = 1000800L
  private def sec(s: Long): Long = (BaseSec + s) * 1000000L

  private var qId = 0
  private def nextName(): String = { qId += 1; s"ooo_spec_$qId" }

  /** Feed `batches` one micro-batch at a time and collect the sink +
    * the caller-visible drop count (accumulator + engine watermark
    * metric).
    */
  private def drain[I: org.apache.spark.sql.Encoder, O](
      batches: Seq[Seq[I]],
      wire: (Dataset[I], org.apache.spark.util.LongAccumulator)
        => Dataset[O]): (Seq[org.apache.spark.sql.Row], Long) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val acc = spark.sparkContext.longAccumulator
    val input = MemoryStream[I]
    val name = nextName()
    val q: StreamingQuery = wire(input.toDS(), acc).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    batches.foreach { b =>
      input.addData(b)
      q.processAllAvailable()
    }
    val engineDrops = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsDroppedByWatermark).sum
    q.stop()
    (spark.table(name).collect().toSeq, acc.value + engineDrops)
  }

  // ---- sessions ---------------------------------------------------------

  /** u1: one 3-event session then a second; u2: two singletons.
    * The sentinel user 99 advances the watermark far enough to
    * timeout-flush every real group (excluded from assertions).
    */
  private val sessExpected = Set(
    (1L, sec(0), sec(1200), 3L), (1L, sec(5000), sec(5300), 2L),
    (2L, sec(100), sec(100), 1L), (2L, sec(2500), sec(2500), 1L))

  private def sessRows(rows: Seq[org.apache.spark.sql.Row]) = rows
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .filter(_._1 != 99L).toSet

  private def sEv(u: Long, id: Long, tsSec: Long) =
    SessionStream.Ev(u, id, sec(tsSec))

  test("sessions: shuffled arrival within lateness = in-order output; " +
    "all groups flush by event-time timeout") {
    val lateness = 600L
    val inOrder = Seq(
      Seq(sEv(1, 1, 0), sEv(2, 1, 100), sEv(1, 2, 600)),
      Seq(sEv(1, 3, 1200), sEv(2, 2, 2500)),
      Seq(sEv(1, 4, 5000), sEv(1, 5, 5300)),
      Seq(sEv(99, 1, 100000)), Seq(sEv(99, 2, 100001)))
    // permuted within batches AND across them (u1@5300 arrives a
    // batch BEFORE u1@5000 — disorder the in-order twin mis-sessions)
    val shuffled = Seq(
      Seq(sEv(2, 1, 100), sEv(1, 2, 600), sEv(1, 1, 0)),
      Seq(sEv(2, 2, 2500), sEv(1, 3, 1200)),
      Seq(sEv(1, 5, 5300)),
      Seq(sEv(1, 4, 5000), sEv(99, 1, 100000)),
      Seq(sEv(99, 2, 100001)))
    val (a, dropsA) = drain[SessionStream.Ev, SessionStream.Session](
      inOrder, (ds, acc) => OooStream.sessions(ds, lateness, Some(acc)))
    val (b, dropsB) = drain[SessionStream.Ev, SessionStream.Session](
      shuffled, (ds, acc) => OooStream.sessions(ds, lateness, Some(acc)))
    assert(sessRows(a) == sessExpected, s"in-order: ${sessRows(a)}")
    assert(sessRows(b) == sessExpected, s"shuffled: ${sessRows(b)}")
    assert(dropsA == 0L && dropsB == 0L,
      "nothing exceeded the allowed lateness")
  }

  test("sessions: an arrival beyond the lateness is dropped and " +
    "counted, output unchanged") {
    val lateness = 600L
    val batches = Seq(
      Seq(sEv(1, 1, 0), sEv(2, 1, 100), sEv(1, 2, 600)),
      Seq(sEv(1, 3, 1200), sEv(2, 2, 2500)),
      // u2@200 arrives when the watermark is already at 1900 —
      // beyond the 600 s lateness, must not rewrite u2's history
      Seq(sEv(1, 4, 5000), sEv(1, 5, 5300), sEv(2, 3, 200)),
      Seq(sEv(99, 1, 100000)), Seq(sEv(99, 2, 100001)))
    val (rows, drops) = drain[SessionStream.Ev, SessionStream.Session](
      batches, (ds, acc) => OooStream.sessions(ds, lateness, Some(acc)))
    assert(sessRows(rows) == sessExpected,
      "a late-beyond-lateness event must not change the output")
    assert(drops >= 1L, "the drop must be counted, not silent")
  }

  // ---- funnel -----------------------------------------------------------

  private def fEv(u: Long, id: Long, tp: String, tsSec: Long) =
    FunnelStream.Ev(u, id, tp, sec(tsSec))

  test("funnel: purchase arriving before the click converts under " +
    "the ooo variant; the in-order twin documents the miss") {
    // 900, not 600: the watermark after batch 0 is 1300 − lateness,
    // and the click@700 arriving in batch 1 must stay strictly above
    // it (1300 − 900 = 400 < 700) or the engine's own late filter
    // takes it before the reorder buffer can
    val lateness = 900L
    // ARRIVAL order: view, purchase, then click — event-times are
    // view@100 < click@700 < purchase@1300
    val arrival = Seq(
      Seq(fEv(1, 1, "view", 100), fEv(1, 3, "purchase", 1300)),
      Seq(fEv(1, 2, "click", 700)),
      Seq(fEv(99, 9, "view", 100000)),
      Seq(fEv(99, 10, "view", 100001)))
    val (rows, drops) = drain[FunnelStream.Ev, FunnelStream.Conversion](
      arrival, (ds, acc) => OooStream.conversions(ds, lateness, Some(acc)))
    val convs = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 != 99L)
    assert(convs == Seq((1L, sec(100), sec(700), sec(1300))))
    assert(drops == 0L)

    // the same arrival through the IN-ORDER twin: the purchase is
    // folded before the click ever arrives, so no conversion — the
    // contract gap these variants exist to close
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val input = MemoryStream[FunnelStream.Ev]
    val name = nextName()
    val q = FunnelStream.conversions(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    arrival.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(spark.table(name).where("user_id != 99").isEmpty,
      "in-order twin mis-orders this arrival (documented)")
  }

  test("funnel: a partial funnel survives an idle timeout flush — " +
    "stages spanning micro-batches, none late, still convert") {
    val lateness = 600L
    // u1's stages land in batches 0/2/3; sentinel u99 advances the
    // watermark BETWEEN them so u1's group timeout-fires while its
    // buffer is empty (batch 1). A flush that discarded the folded
    // FunnelState would lose t1 and the funnel would never convert —
    // the silent-loss mode this spec pins shut.
    val batches = Seq(
      Seq(fEv(1, 1, "view", 1000), fEv(99, 90, "view", 2000)),
      Seq(fEv(99, 91, "view", 2500)), // u1 idle: timeout fires here
      Seq(fEv(1, 2, "click", 2200), fEv(99, 92, "view", 3000)),
      Seq(fEv(1, 3, "purchase", 2900), fEv(99, 93, "view", 4000)),
      Seq(fEv(99, 94, "view", 10000)))
    val (rows, drops) = drain[FunnelStream.Ev, FunnelStream.Conversion](
      batches, (ds, acc) => OooStream.conversions(ds, lateness, Some(acc)))
    val convs = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 != 99L)
    assert(convs == Seq((1L, sec(1000), sec(2200), sec(2900))),
      s"partial funnel lost across the idle flush: $convs")
    assert(drops == 0L, "nothing here is late")
  }

  // ---- resample + forward fill -------------------------------------------

  private def rEv(u: Long, id: Long, tsSec: Long, v: Double) =
    ResampleStream.Ev(u, id, sec(tsSec), v)

  test("resample: cross-batch disorder within lateness folds into " +
    "the right buckets; in-order arrival agrees") {
    // 3800 keeps the 3600-bucket stragglers strictly above the
    // post-batch-0 watermark (7210 − 3800 = 3410 < 3600)
    val lateness = 3800L
    // event-times: 0 (1.0), 3600 (2.0), 3700 (8.0), 7210 (4.0); the
    // 3600-bucket events ARRIVE after the 7200-bucket event
    val shuffled = Seq(
      Seq(rEv(1, 1, 0, 1.0), rEv(1, 4, 7210, 4.0)),
      Seq(rEv(1, 3, 3700, 8.0), rEv(1, 2, 3600, 2.0)),
      Seq(rEv(99, 9, 100000, 0.0)), Seq(rEv(99, 10, 100001, 0.0)))
    val inOrder = Seq(
      Seq(rEv(1, 1, 0, 1.0), rEv(1, 2, 3600, 2.0)),
      Seq(rEv(1, 3, 3700, 8.0), rEv(1, 4, 7210, 4.0)),
      Seq(rEv(99, 9, 100000, 0.0)), Seq(rEv(99, 10, 100001, 0.0)))
    val expected = Set(
      (1L, BaseSec, 1L, 1.0, 1.0), (1L, BaseSec + 3600L, 2L, 10.0, 10.0),
      (1L, BaseSec + 7200L, 1L, 4.0, 4.0))
    def buckets(rows: Seq[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .filter(_._1 != 99L).toSet
    val (a, dropsA) = drain[ResampleStream.Ev, ResampleStream.Bucket](
      shuffled, (ds, acc) => OooStream.resample(ds, lateness, Some(acc)))
    val (b, dropsB) = drain[ResampleStream.Ev, ResampleStream.Bucket](
      inOrder, (ds, acc) => OooStream.resample(ds, lateness, Some(acc)))
    assert(buckets(a) == expected, s"shuffled: ${buckets(a)}")
    assert(buckets(b) == expected, s"in-order: ${buckets(b)}")
    assert(dropsA == 0L && dropsB == 0L)
  }

  // ---- sequence packing ---------------------------------------------------

  private def pEv(src: String, id: Long, nTok: Long, tsSec: Long) =
    OooStream.PackEv(src, id, nTok, sec(tsSec))

  test("packing: cross-batch disorder within lateness packs " +
    "bit-identically to in-order arrival; the in-order twin " +
    "documents the miss") {
    val lateness = 900L
    val budget = 100L
    // s1 docs (doc_id = ts order): doc 1 is 150 tokens (SPANS the
    // seq-0/1 boundary), doc 2 is 50 and closes seq 1. Folded in ts
    // order: seq 0 = {doc1} (1 doc, 1 start), seq 1 = {doc1 spill,
    // doc2} (2 docs, 1 start). Folded in the shuffled ARRIVAL order
    // the boundary lands inside doc 1 differently: seq 0 = {doc2,
    // doc1} (2 docs, 2 starts), seq 1 = {doc1 spill} (1 doc, 0
    // starts) — the counter divergence the reorder buffer absorbs.
    val inOrder = Seq(
      Seq(pEv("s1", 1, 150, 100)),
      Seq(pEv("s1", 2, 50, 700)),
      Seq(pEv("zz", 9, 1, 100000)), Seq(pEv("zz", 10, 1, 100001)))
    val shuffled = Seq(
      Seq(pEv("s1", 2, 50, 700)),
      Seq(pEv("s1", 1, 150, 100)),
      Seq(pEv("zz", 9, 1, 100000)), Seq(pEv("zz", 10, 1, 100001)))
    def packs(rows: Seq[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(_._1 != "zz").toSet
    val (a, dropsA) = drain[OooStream.PackEv, PackStream.Packed](
      inOrder, (ds, acc) => OooStream.packed(ds, budget, lateness,
        Some(acc)))
    val (b, dropsB) = drain[OooStream.PackEv, PackStream.Packed](
      shuffled, (ds, acc) => OooStream.packed(ds, budget, lateness,
        Some(acc)))
    val expected = Set(("s1", 0L, 1L, 1L, 100L), ("s1", 1L, 2L, 1L, 100L))
    assert(packs(a) == expected, s"in-order: ${packs(a)}")
    assert(packs(b) == expected, s"shuffled: ${packs(b)}")
    assert(dropsA == 0L && dropsB == 0L)

    // the same shuffled arrival through the IN-ORDER twin folds doc 2
    // first, so the sequence boundaries land differently — the
    // contract gap the ooo variant closes
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val input = MemoryStream[PackStream.Doc]
    val name = nextName()
    val q = PackStream.packed(input.toDS(), budget).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    shuffled.foreach { b =>
      input.addData(b.map(e => PackStream.Doc(e.source, e.doc_id,
        e.n_tok)))
      q.processAllAvailable()
    }
    q.stop()
    val tw = spark.table(name).collect().toSeq
    assert(packs(tw) != expected,
      "in-order twin mis-packs this arrival (documented)")
  }

  test("packing: a doc arriving beyond the lateness is dropped and " +
    "counted; running offsets survive the idle flush") {
    val lateness = 600L
    val budget = 100L
    val batches = Seq(
      Seq(pEv("s1", 1, 60, 100), pEv("zz", 8, 1, 2000)),
      Seq(pEv("zz", 9, 1, 3000)), // s1 idle: timeout flush fires
      // doc 2 continues s1's token stream AFTER the flush (ts above
      // watermark, nothing late): cum offset 60 must have survived
      Seq(pEv("s1", 2, 60, 2800)),
      // doc at ts 200 arrives when the watermark is far past — late
      Seq(pEv("s1", 7, 999, 200), pEv("zz", 10, 1, 100000)),
      Seq(pEv("zz", 11, 1, 100001)))
    val (rows, drops) = drain[OooStream.PackEv, PackStream.Packed](
      batches, (ds, acc) => OooStream.packed(ds, budget, lateness,
        Some(acc)))
    val packs = rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(_._1 != "zz").toSet
    // 60 + 60 tokens: seq 0 closes with both docs contributing —
    // only possible if PackState survived the idle timeout
    assert(packs == Set(("s1", 0L, 2L, 2L, 100L)), s"got $packs")
    assert(drops == 1L, "the late doc must be counted, not folded")
  }

  // ---- first-wins dedup -----------------------------------------------------

  private def dEv(h: String, id: Long, tsSec: Long) =
    OooStream.DEv(h, id, sec(tsSec))

  test("dedup: the winner is the (ts, id) minimum within lateness " +
    "regardless of arrival order; the in-order twin keeps the " +
    "arrival-first row (documented)") {
    val lateness = 900L
    // h1's true winner (ts 100, id 4) ARRIVES after the ts-700 copy
    val shuffled = Seq(
      Seq(dEv("h1", 5, 700), dEv("h2", 6, 200)),
      Seq(dEv("h1", 4, 100)),
      Seq(dEv("zz", 9, 100000)), Seq(dEv("zz", 10, 100001)))
    val inOrder = Seq(
      Seq(dEv("h1", 4, 100), dEv("h2", 6, 200)),
      Seq(dEv("h1", 5, 700)),
      Seq(dEv("zz", 9, 100000)), Seq(dEv("zz", 10, 100001)))
    def winners(rows: Seq[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != "zz").toSet
    val expected = Set(("h1", 4L, sec(100)), ("h2", 6L, sec(200)))
    val (a, dropsA) = drain[OooStream.DEv, OooStream.Winner](
      shuffled, (ds, acc) => OooStream.firstWins(ds, lateness, Some(acc)))
    val (b, dropsB) = drain[OooStream.DEv, OooStream.Winner](
      inOrder, (ds, acc) => OooStream.firstWins(ds, lateness, Some(acc)))
    assert(winners(a) == expected, s"shuffled: ${winners(a)}")
    assert(winners(b) == expected, s"in-order: ${winners(b)}")
    assert(dropsA == 0L && dropsB == 0L)
  }

  test("dedup: a beyond-lateness copy of an emitted hash is counted, " +
    "never re-emitted; the emitted flag survives the flush") {
    val lateness = 600L
    val batches = Seq(
      Seq(dEv("h1", 1, 100), dEv("zz", 8, 2000)),
      Seq(dEv("zz", 9, 3000)), // h1 flushes, winner emitted
      // a very late copy with a SMALLER (ts, id) than the winner —
      // without the frontier it would steal the win and duplicate h1
      Seq(dEv("h1", 0, 50), dEv("zz", 10, 100000)),
      Seq(dEv("zz", 11, 100001)))
    val (rows, drops) = drain[OooStream.DEv, OooStream.Winner](
      batches, (ds, acc) => OooStream.firstWins(ds, lateness, Some(acc)))
    val winners = rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != "zz")
    assert(winners == Seq(("h1", 1L, sec(100))), s"got $winners")
    assert(drops == 1L, "the late copy must be counted")
  }

  // ---- RFI window frontier -----------------------------------------------

  private class FakeState(var v: Option[RfiStream.Buf])
      extends org.apache.spark.sql.streaming.GroupState[RfiStream.Buf] {
    override def exists: Boolean = v.isDefined
    override def get: RfiStream.Buf = v.get
    override def getOption: Option[RfiStream.Buf] = v
    override def update(s: RfiStream.Buf): Unit = { v = Some(s) }
    override def remove(): Unit = { v = None }
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = {}
    override def setTimeoutDuration(d: String): Unit = {}
    override def setTimeoutTimestamp(t: Long): Unit = {}
    override def setTimeoutTimestamp(t: Long, add: String): Unit = {}
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = {}
    override def setTimeoutTimestamp(t: java.sql.Date,
                                     add: String): Unit = {}
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private val strat = RfiStrategy(madK = 4.0)
  private def cell(t: Long, chan: Long, amp: Double): RfiCell =
    RfiCell(0L, t, chan, Seq(amp), flag = false)

  test("RFI: arrival permuted within the window = in-order output; " +
    "beyond-window arrivals dropped and counted, never re-emitted") {
    val window = 4L
    val all = for (t <- 0L to 7L; c <- 0L to 3L)
      yield cell(t, c, if (t == 3 && c == 2) 40.0 else 1.0)
    def run(batches: Seq[Seq[RfiCell]]) = {
      val acc = spark.sparkContext.longAccumulator
      val st = new FakeState(None)
      val emitted = batches.flatMap(b =>
        RfiStream.updateBl(0L, b.iterator, st, window, strat,
          Some(acc)).toList)
      val open = st.v.map(b =>
        RfiStream.openFlags(0L, b, strat).toList).getOrElse(Nil)
      ((emitted ++ open).map(o => (o.t, o.chan, o.rfi)).toSet,
        acc.value)
    }
    val inOrder = all.grouped(8).map(_.toSeq).toSeq
    // permute WITHIN the window: t=1 cells arrive after t=2/3 cells,
    // but never after their timestep exits (window 4)
    val permuted = Seq(
      all.filter(c => c.t == 0L || c.t == 2L),
      all.filter(c => c.t == 3L || c.t == 1L),
      all.filter(c => c.t == 5L || c.t == 4L),
      all.filter(c => c.t == 7L || c.t == 6L))
    val (a, dropsA) = run(inOrder)
    val (bOut, dropsB) = run(permuted)
    assert(a == bOut, "window-bounded disorder must not change flags")
    assert(dropsA == 0L && dropsB == 0L)

    // a cell for t=0 arriving after t=0 exited the window must be
    // dropped and counted — re-emitting it would both duplicate the
    // (t, chan) row and flag it against a truncated context
    val lateBatches = inOrder :+ Seq(cell(0L, 0L, 99.0))
    val (c2, dropsC) = run(lateBatches)
    assert(c2 == a, "a beyond-window arrival must not change output")
    assert(dropsC == 1L, "the drop must be counted")
  }
}
