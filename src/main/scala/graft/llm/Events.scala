package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (batch side; the
  * Structured Streaming twin lives in graft.streaming.EventsStream).
  *
  * The events fixture has shipped with two physical `ts` encodings
  * (nanosecond int64, which Spark reads as raw longs under
  * spark.sql.legacy.parquet.nanosAsLong, and plain microsecond
  * TIMESTAMP); [[readEvents]] normalises BOTH to one integer `ts_us`
  * epoch-microsecond column so every downstream window is integer
  * arithmetic — deterministic and identical to the DuckDB oracle's
  * `epoch_ns(ts) // 1000`.
  */
object Events {

  /** Epoch-microseconds expression for a `ts` column of either physical
    * type. Timestamp columns go through a cast to session-zoned
    * timestamp; every entry point pins spark.sql.session.timeZone=UTC,
    * so this matches DuckDB's treat-naive-as-UTC epoch_ns exactly.
    */
  def tsMicros(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000")
    case _ => expr("unix_micros(CAST(ts AS TIMESTAMP))")
  }

  /** CONTRACT: downstream bucket arithmetic (windowAgg, resample) uses
    * Spark's truncating `div` where the DuckDB oracle floors with `//`
    * — identical for ts_us >= 0, divergent for pre-epoch timestamps.
    * The fixture is epoch-positive by construction and
    * [[graft.streaming.FunnelStream]] enforces it loudly per row;
    * [[retention]] is the one operator that computes exact floor
    * division and so is negative-safe regardless.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_us", tsMicros(raw.schema("ts").dataType))
  }

  /** Tumbling 5-minute windows per event type: count + sum(value).
    * One hash aggregate; at scale the map-side combine reduces each
    * (window, type) to one partial row per task.
    */
  def windowAgg(events: DataFrame, windowSec: Long = 300): DataFrame =
    events
      .withColumn("win_start_s",
        expr(s"(ts_us div ${windowSec * 1000000}) * $windowSec"))
      .groupBy("win_start_s", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Ordered conversion funnel (view → click → purchase): per user,
    * the first view, the first click strictly after it, and the first
    * purchase strictly after that — the strict-sequence funnel product
    * analytics runs. All three stage times come from windows over the
    * SAME user partitioning, so Spark plans ONE shuffle; missing
    * stages surface as the integer sentinel −1 (exact, no null/float
    * drift between engines).
    */
  def funnel(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val t1 = min(when(col("event_type") === "view", col("ts_us")))
      .over(byUser)
    events
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("t1", t1)
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("ts_us") > col("t1"), col("ts_us"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t2"), col("ts_us"))).over(byUser))
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L).as("stage"),
        coalesce(col("t1"), lit(-1L)).as("t1_us"),
        coalesce(col("t2"), lit(-1L)).as("t2_us"),
        coalesce(col("t3"), lit(-1L)).as("t3_us"))
      .distinct()
  }

  /** Weekly cohort retention: users cohort by the epoch-week of their
    * first event; each (cohort_week, week_offset) cell counts how many
    * of that cohort were active that many weeks later — the classic
    * retention triangle, in exact integer week arithmetic.
    *
    * Shape: one distinct over (user, week) — map-side combined — then
    * a per-user min and one final cell aggregate; after the distinct,
    * (user, week) rows are unique so the cell count needs no
    * count-distinct shuffle of its own.
    */
  def retention(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // exact FLOOR division (Spark's `div` truncates toward zero, the
    // DuckDB oracle's `//` floors — they differ on pre-epoch ts_us, so
    // the correction keeps the week bucket engine-independent for
    // negative timestamps instead of silently relying on a ts_us >= 0
    // fixture contract)
    val act = events
      .selectExpr("user_id",
        s"CAST(ts_us div $weekUs - (CASE WHEN ts_us < 0 AND " +
          s"ts_us % $weekUs != 0 THEN 1 ELSE 0 END) AS BIGINT) AS wk")
      .distinct()
    val cohort = act.groupBy("user_id").agg(min("wk").as("wk0"))
    act.join(cohort, Seq("user_id"))
      .groupBy(col("wk0").as("cohort_week"),
        (col("wk") - col("wk0")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Sessionisation: per-user sessions split on gaps > `gapSec`.
    * lag + cumulative-sum-of-new-session-flags, the classic two-window
    * formulation — both windows share the (user_id) partitioning so
    * Spark plans ONE shuffle.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapSec * 1000000L
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        expr("max(ts_us) - min(ts_us)").as("duration_us"))
  }

  /** Semi-structured props extraction: parse the JSON `props` column and
    * aggregate by event type — the string/JSON function surface the
    * reference lacks entirely (SURVEY §2.9). Pure expression work;
    * get_json_object is codegen'd.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Temporal resample with forward fill: per user, a DENSE grid of
    * `bucketSec` buckets spanning that user's observed range, each
    * bucket carrying its event count, its (rounded) value sum, and the
    * last non-empty bucket's sum forward-filled across gaps — the
    * gap-fill/resample operator every metrics pipeline needs and the
    * reference (pure dense-tensor batch) has no analogue for.
    *
    * Scale shape: one aggregate to bucket, one tiny per-user span
    * aggregate, a `sequence` explode to densify (output rows =
    * users × span-buckets, independent of event count), and ONE window
    * partitioned by user for the fill — all shuffles share the
    * user_id key.
    */
  def resampleFfill(events: DataFrame,
                    bucketSec: Long = 3600): DataFrame = {
    val bucketUs = bucketSec * 1000000L
    val agg = events
      .withColumn("bucket_s",
        expr(s"(ts_us div $bucketUs) * $bucketSec"))
      .groupBy("user_id", "bucket_s")
      .agg(count(lit(1)).as("n_ev"),
        round(sum(col("value")), 4).as("bv"))
    val grid = agg.groupBy("user_id")
      .agg(min("bucket_s").as("b0"), max("bucket_s").as("b1"))
      .select(col("user_id"),
        explode(expr(s"sequence(b0, b1, $bucketSec)")).as("bucket_s"))
    val w = Window.partitionBy("user_id").orderBy("bucket_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("user_id", "bucket_s"), "left")
      .withColumn("fill_value",
        coalesce(last(col("bv"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("user_id"), col("bucket_s"),
        coalesce(col("n_ev"), lit(0L)).as("n_events"),
        coalesce(col("bv"), lit(0.0)).as("bucket_value"),
        col("fill_value"))
  }

  /** As-of join: attach to each event the most recent order (by
    * o_orderdate) of the matching customer bucket at or before the event
    * time. Spark lacks a native as-of join; the scale-correct formulation
    * is the union + last-non-null-window trick: one shuffle on the key,
    * no range-join row explosion.
    *
    * Tie rules: orders sort before events at the same instant
    * (inclusive <=); equal-timestamp orders resolve to the max
    * o_orderkey.
    */
  def asofLatestOrder(events: DataFrame, orders: DataFrame,
                      buckets: Int = 25): DataFrame = {
    val ev = events.select(
      (col("user_id") % buckets).as("k"),
      col("ts_us").as("tus"),
      lit(1L).as("typ"),
      lit(null).cast("long").as("o_orderkey"),
      col("event_id"))
    val od = orders.select(
      (col("o_custkey") % buckets).as("k"),
      // parquet ms-timestamps surface as TIMESTAMP_NTZ in Spark 4; the
      // session is pinned to UTC so this cast matches DuckDB's epoch_us
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("tus"),
      lit(0L).as("typ"),
      col("o_orderkey"),
      lit(null).cast("long").as("event_id"))
    val w = Window.partitionBy("k")
      .orderBy(col("tus"), col("typ"), col("o_orderkey").asc_nulls_last,
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionAll(od)
      .withColumn("matched_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("typ") === 1)
      .select(col("event_id"), col("k"), col("matched_orderkey"))
  }
}
