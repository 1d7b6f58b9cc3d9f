package graft

import graft.llm.Events
import graft.streaming.ResampleStream
import graft.streaming.ResampleStream.{BucketState, Ev}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The stateful resample transition is pure — test it directly, then
  * drive the WHOLE events fixture through it and require exact
  * agreement with the batch operator (emitted rows + the open bucket
  * per user = Events.resampleFfill).
  */
class ResampleStreamSpec extends AnyFunSuite {

  private class FakeState(var v: Option[BucketState])
      extends org.apache.spark.sql.streaming.GroupState[BucketState] {
    override def exists: Boolean = v.isDefined
    override def get: BucketState = v.get
    override def getOption: Option[BucketState] = v
    override def update(s: BucketState): Unit = { v = Some(s) }
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
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val us = 1000000L
  private val hourUs = 3600L * us

  test("gap buckets are emitted with the forward-filled value") {
    val st = new FakeState(None)
    val out = ResampleStream.updateUser(1L, Iterator(
      Ev(1, 1, 0, 2.5), Ev(1, 2, 1000, 1.5), // bucket 0, sum 4.0
      Ev(1, 3, 3 * hourUs, 9.0)), st).toList // jumps to bucket 3
    assert(out.map(b => (b.bucket_s, b.n_events, b.bucket_value,
      b.fill_value)) == List(
      (0L, 2L, 4.0, 4.0),
      (3600L, 0L, 0.0, 4.0),
      (7200L, 0L, 0.0, 4.0)))
    // bucket 3 stays open
    assert(st.v.contains(BucketState(10800L, 1L, 9.0)))
  }

  test("idle timeout flushes the open bucket and clears state") {
    val st = new FakeState(Some(BucketState(3600L, 2L, 5.0))) {
      override def hasTimedOut: Boolean = true
    }
    val out = ResampleStream.updateUser(1L, Iterator.empty, st).toList
    assert(out == List(
      ResampleStream.Bucket(1L, 3600L, 2L, 5.0, 5.0)))
    assert(st.v.isEmpty, "state must be removed after the flush")
  }

  test("whole-fixture parity with the batch operator") {
    import spark.implicits._
    val events = Events.readEvents(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_id", $"ts_us", $"value")
      .as[(Long, Long, Long, Double)].collect()
      .map(e => Ev(e._1, e._2, e._3, e._4))
    val streamed = events.groupBy(_.user_id).toSeq.flatMap {
      case (uid, evs) =>
        val st = new FakeState(None)
        val emitted = ResampleStream
          .updateUser(uid, evs.iterator, st).toList
        emitted :+ ResampleStream.openBucket(st.v.get, uid)
    }
    val batch = Events
      .resampleFfill(Events.readEvents(spark, "/root/testdata/sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val stream = streamed.map(b => (b.user_id, b.bucket_s, b.n_events,
      b.bucket_value, b.fill_value)).toSet
    assert(stream.size == streamed.size, "duplicate emitted buckets")
    val onlyBatch = batch -- stream
    val onlyStream = stream -- batch
    assert(onlyBatch.isEmpty && onlyStream.isEmpty,
      s"batch-only: ${onlyBatch.take(3)} stream-only: " +
        s"${onlyStream.take(3)}")
  }
}
