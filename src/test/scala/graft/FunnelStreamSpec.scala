package graft

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Conversion, Ev, FunnelState}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel: transition semantics (strict order, single
  * emission, cross-batch continuation) and completed-conversion parity
  * with the batch operator on the real fixture.
  */
class FunnelStreamSpec extends AnyFunSuite {

  private def state(v: Option[FunnelState]): TestGroupState[FunnelState] =
    TestGroupState.create[FunnelState](
      org.apache.spark.api.java.Optional.ofNullable(v.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long],
      hasTimedOut = false)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a completed funnel emits once, at the completing event") {
    val st = state(None)
    val out = FunnelStream.updateUser(1L, Iterator(
      Ev(1, 1, "view", 5), Ev(1, 2, "click", 7), Ev(1, 3, "view", 9),
      Ev(1, 4, "purchase", 15), Ev(1, 5, "purchase", 30)), st).toList
    assert(out == List(Conversion(1L, 5L, 7L, 15L)))
    assert(st.getOption.contains(FunnelState(5L, 7L, 15L)))
  }

  test("out-of-order stages within a batch are sorted first; ties " +
    "do not advance") {
    val st = state(None)
    val out = FunnelStream.updateUser(2L, Iterator(
      Ev(2, 2, "click", 9), Ev(2, 1, "view", 9), Ev(2, 3, "click", 11),
      Ev(2, 4, "purchase", 11)), st).toList
    // view and click tie at 9 -> click does not qualify; click at 11
    // qualifies; purchase at 11 ties with the click -> no conversion
    assert(out.isEmpty)
    assert(st.getOption.contains(FunnelState(9L, 11L, -1L)))
  }

  test("cross-batch continuation equals one batch") {
    val evs = Seq(Ev(3, 1, "view", 1), Ev(3, 2, "click", 2),
      Ev(3, 3, "purchase", 3))
    val one = state(None)
    val whole = FunnelStream.updateUser(3L, evs.iterator, one).toList
    val two = state(None)
    val a = FunnelStream.updateUser(3L, evs.take(2).iterator, two).toList
    val mid = two.getOption
    val b = FunnelStream.updateUser(3L,
      evs.drop(2).iterator, state(mid)).toList
    assert(a ++ b == whole)
  }

  test("stream completions equal the batch operator's stage-3 rows") {
    val dir = "/root/testdata/sf0.001"
    val streamed = FunnelStream.conversionsOnce(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val batch = graft.llm.Events.funnel(
      graft.llm.Events.readEvents(spark, dir))
      .where(col("stage") === 3)
      .select("user_id", "t1_us", "t2_us", "t3_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
