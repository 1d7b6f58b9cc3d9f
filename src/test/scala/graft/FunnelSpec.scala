package graft

import graft.llm.Events
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Funnel semantics: strict ordering between stages, ties excluded,
  * sentinel for missing stages.
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def evOf(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type", "ts_us")
  }

  private def run(rows: (Long, String, Long)*) =
    Events.funnel(evOf(rows: _*)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

  test("full conversion picks the first qualifying event per stage") {
    val out = run(
      (1L, "view", 10L), (1L, "view", 5L), (1L, "click", 7L),
      (1L, "click", 20L), (1L, "purchase", 15L), (1L, "purchase", 30L))
    // first view at 5; both clicks (7, 20) follow it -> min 7;
    // purchases (15, 30) follow 7 -> min 15
    assert(out(1L) == ((3L, 5L, 7L, 15L)))
  }

  test("stages stop where the strict order breaks") {
    val out = run(
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 8L),
      (3L, "view", 1L), (3L, "click", 4L),
      (4L, "click", 1L), (4L, "purchase", 2L))
    assert(out(2L) == ((1L, 10L, -1L, -1L))) // click precedes the view
    assert(out(3L) == ((2L, 1L, 4L, -1L))) // no purchase at all
    assert(out(4L) == ((0L, -1L, -1L, -1L))) // never viewed
  }

  test("retention: cohorts by first-event week, offsets count actives") {
    val wk = 7L * 86400L * 1000000L
    // user 1: weeks 0,1,3; user 2: weeks 0,1; user 3: week 1 only
    val out = Events.retention(evOf(
      (1L, "view", 1L), (1L, "view", wk + 5L), (1L, "view", 3 * wk),
      (2L, "view", 10L), (2L, "click", wk + 1L),
      (3L, "view", wk + 2L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // cohort 0: users 1,2 active week 0
      (0L, 1L) -> 2L, // both back in week 1
      (0L, 3L) -> 1L, // only user 1 in week 3
      (1L, 0L) -> 1L)) // cohort 1: user 3
  }

  test("a tie does not advance the funnel (strictly after)") {
    val out = run((5L, "view", 9L), (5L, "click", 9L),
      (5L, "click", 11L))
    assert(out(5L) == ((2L, 9L, 11L, -1L)))
  }
}
