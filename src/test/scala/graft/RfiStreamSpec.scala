package graft

import graft.model.Dims
import graft.ops.{FlagOps, RfiCell, RfiFlag, RfiStrategy}
import graft.streaming.RfiStream
import graft.streaming.RfiStream.Buf
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming RFI: the stateful transition is pure — test window
  * mechanics directly, then drive the whole sf0.001 flagged fixture
  * through it and require exact agreement with the batch operator
  * (emitted rows + open-state flags = RfiFlag).
  */
class RfiStreamSpec extends AnyFunSuite {

  private class FakeState(var v: Option[Buf])
      extends org.apache.spark.sql.streaming.GroupState[Buf] {
    override def exists: Boolean = v.isDefined
    override def get: Buf = v.get
    override def getOption: Option[Buf] = v
    override def update(s: Buf): Unit = { v = Some(s) }
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

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val strat = RfiStrategy(madK = 4.0)

  private def cell(t: Long, chan: Long, amp: Double): RfiCell =
    RfiCell(0L, t, chan, Seq(amp), flag = false)

  test("rows are emitted exactly once, when they exit the window") {
    val st = new FakeState(None)
    // batch 1: timesteps 0..3, window 4 -> nothing exits
    val b1 = (for (t <- 0L to 3L; c <- 0L to 3L)
      yield cell(t, c, 1.0)).toList
    assert(RfiStream.updateBl(0L, b1.iterator, st, 4L, strat).isEmpty)
    assert(st.v.get.cells.size == 16)
    // batch 2: timesteps 4..5 arrive -> timesteps 0..1 exit
    val b2 = (for (t <- 4L to 5L; c <- 0L to 3L)
      yield cell(t, c, 1.0)).toList
    val out = RfiStream.updateBl(0L, b2.iterator, st, 4L, strat).toList
    assert(out.map(_.t).distinct.sorted == List(0L, 1L))
    assert(out.size == 8)
    // state retains exactly the window
    assert(st.v.get.cells.map(_.t).distinct.sorted == Seq(2L, 3L, 4L, 5L))
    // open flags complete the set
    val open = RfiStream.openFlags(0L, st.v.get, strat).toList
    assert(open.map(_.t).distinct.sorted == List(2L, 3L, 4L, 5L))
  }

  test("an exiting RFI spike is detected with its trailing context") {
    val st = new FakeState(None)
    val quiet = (for (t <- 0L to 3L; c <- 0L to 7L)
      yield cell(t, c, 1.0 + 0.01 * ((t * 7 + c) % 5))).toList
    // a hot cell at the OLDEST timestep
    val withSpike = quiet.map(c =>
      if (c.t == 0L && c.chan == 3L) c.copy(amps = Seq(50.0)) else c)
    RfiStream.updateBl(0L, withSpike.iterator, st, 4L, strat)
    val out = RfiStream.updateBl(0L,
      (for (c <- 0L to 7L) yield cell(4L, c, 1.0)).iterator,
      st, 4L, strat).toList
    // t=0 exited; its spike cell must be flagged
    assert(out.exists(o => o.t == 0L && o.chan == 3L && o.rfi))
  }

  test("batch parity: emitted + open flags equal RfiFlag on the " +
    "full fixture") {
    import spark.implicits._
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    val cells = flagged.select(col("bl"), col("t"), col("chan"),
      array(sqrt(col("v0") * col("v0") + col("v1") * col("v1")))
        .as("amps"), col("flag")).as[RfiCell].collect()
    // one "micro-batch" per baseline through the pure transition,
    // window covering everything -> nothing exits, open = batch
    val byBl = cells.groupBy(_.bl)
    val streamed = byBl.flatMap { case (bl, rows) =>
      val st = new FakeState(None)
      val emitted = RfiStream.updateBl(bl, rows.iterator, st, 1000L,
        RfiStrategy()).toList
      assert(emitted.isEmpty, "window covers the data: nothing exits")
      RfiStream.openFlags(bl, st.v.get, RfiStrategy())
    }.map(o => (o.bl, o.t, o.chan, o.rfi)).toSet
    val batch = RfiFlag(flagged)
      .select("bl", "t", "chan", "rfi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("batch parity holds under the gaussian-background strategy " +
    "(the detectGroup seam both paths share)") {
    import spark.implicits._
    val gauss = RfiStrategy(madK = 5.0, bgKind = "gaussian",
      bgWindowTime = 2, bgWindowChan = 1, bgSigmaTime = 1.5,
      bgSigmaChan = 1.0, iterations = 2)
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
      .where(col("bl") < 4)
    val cells = flagged.select(col("bl"), col("t"), col("chan"),
      array(sqrt(col("v0") * col("v0") + col("v1") * col("v1")))
        .as("amps"), col("flag")).as[RfiCell].collect()
    val streamed = cells.groupBy(_.bl).flatMap { case (bl, rows) =>
      val st = new FakeState(None)
      assert(RfiStream.updateBl(bl, rows.iterator, st, 1000L,
        gauss).isEmpty)
      RfiStream.openFlags(bl, st.v.get, gauss)
    }.map(o => (o.bl, o.t, o.chan, o.rfi)).toSet
    val batch = RfiFlag(flagged, gauss)
      .select("bl", "t", "chan", "rfi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("batch parity holds under IN-LOOP RMS placement (the r16 " +
    "feedback semantics flow through the streaming twin unchanged)") {
    import spark.implicits._
    val inloop = RfiStrategy(madK = 6.0, iterations = 2,
      rmsIterations = 1, tsRmsThreshold = 1.02, chRmsThreshold = 1.01,
      tsRmsInLoop = true, chRmsInLoop = true)
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
      .where(col("bl") < 4)
    val cells = flagged.select(col("bl"), col("t"), col("chan"),
      array(sqrt(col("v0") * col("v0") + col("v1") * col("v1")))
        .as("amps"), col("flag")).as[RfiCell].collect()
    val streamed = cells.groupBy(_.bl).flatMap { case (bl, rows) =>
      val st = new FakeState(None)
      assert(RfiStream.updateBl(bl, rows.iterator, st, 1000L,
        inloop).isEmpty)
      RfiStream.openFlags(bl, st.v.get, inloop)
    }.map(o => (o.bl, o.t, o.chan, o.rfi)).toSet
    val batch = RfiFlag(flagged, inloop)
      .select("bl", "t", "chan", "rfi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("real stream end-to-end: a second micro-batch advances the " +
    "window and emits the exited timesteps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfi_stream")
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    val cellsDf = flagged
      .where(col("bl") < 3)
      .select(col("bl"), col("t"), col("chan"),
        array(sqrt(col("v0") * col("v0") + col("v1") * col("v1")))
          .as("amps"), col("flag"))
    // micro-batch 1: timesteps 0..7
    cellsDf.where(col("t") < 8).write.mode("overwrite")
      .parquet(dir.toString)
    val stream = spark.readStream.schema(cellsDf.schema)
      .parquet(dir.toString).as[RfiCell]
    val q = RfiStream.flags(stream, window = 8L)
      .writeStream.outputMode("append")
      .format("memory").queryName("rfi_stream").start()
    q.processAllAvailable()
    assert(spark.table("rfi_stream").isEmpty,
      "window 8 covers timesteps 0..7: nothing exits")
    // micro-batch 2: timesteps 8..15 land -> 0..7 exit the window
    cellsDf.where(col("t") >= 8).write.mode("append")
      .parquet(dir.toString)
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("rfi_stream")
    val got = emitted.select("t").distinct().as[Long].collect().sorted
    assert(got.toSeq == (0L to 7L),
      s"exited timesteps, got ${got.toSeq}")
    assert(emitted.count() ==
      cellsDf.where(col("t") < 8)
        .select("bl", "t", "chan").distinct().count(),
      "one emitted row per exited grid cell (duplicate samples " +
        "collapse, as in batch)")
  }
}
