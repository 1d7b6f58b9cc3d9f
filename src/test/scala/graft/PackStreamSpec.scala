package graft

import graft.streaming.PackStream
import graft.streaming.PackStream.{Doc, Packed, PackState}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sequence packing: the pure transition function's span
  * arithmetic, cross-micro-batch continuation, and full-sequence
  * parity with the batch operator on the real fixture.
  */
class PackStreamSpec extends AnyFunSuite {

  /** Spark's official stateful-transition test double. */
  private def state(v: Option[PackState]): TestGroupState[PackState] =
    TestGroupState.create[PackState](
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

  test("a crossing document closes the sequence with exact counters") {
    val st = state(None)
    val out = PackStream.updateSource(4L)("s",
      Iterator(Doc("s", 1, 3), Doc("s", 2, 3)), st).toList
    assert(out == List(Packed("s", 0, 2, 2, 4)))
    assert(st.getOption.contains(PackState(6, 1, 0)))
  }

  test("a long document emits every sequence it fills") {
    val st = state(Some(PackState(2, 1, 1)))
    val out = PackStream.updateSource(4L)("s",
      Iterator(Doc("s", 9, 10)), st).toList
    assert(out == List(
      Packed("s", 0, 2, 2, 4), // the open seq + this doc
      Packed("s", 1, 1, 0, 4), // middle, fully inside the doc
      Packed("s", 2, 1, 0, 4))) // end lands exactly on the boundary
    assert(st.getOption.contains(PackState(12, 0, 0)))
  }

  test("two micro-batches equal one batch with the same documents") {
    val docs = Seq(Doc("s", 1, 5), Doc("s", 2, 2), Doc("s", 3, 9),
      Doc("s", 4, 1), Doc("s", 5, 4))
    val one = state(None)
    val all = PackStream.updateSource(4L)("s", docs.iterator, one).toList
    val two = state(None)
    val a = PackStream.updateSource(4L)("s", docs.take(2).iterator,
      two).toList
    val b = PackStream.updateSource(4L)("s", docs.drop(2).iterator,
      two).toList
    assert(a ++ b == all)
    assert(two.getOption == one.getOption)
  }

  test("stream output equals the batch operator's full sequences") {
    val dir = "/root/testdata/sf0.001"
    val budget = 128
    val streamed = PackStream.packOnce(spark, dir, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    val batch = graft.llm.Corpus.seqPack(
      spark.read.parquet(s"$dir/documents.parquet"), budget)
      .where(col("n_tokens") === budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
