package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming twin of graft.llm.Events.windowAgg: the same
  * tumbling-window aggregate expressed over an unbounded source with
  * watermarking. The reference engine is strictly batch (SURVEY §2.9);
  * this is part of the beyond-the-reference surface a continuous
  * ingestion pipeline needs.
  *
  * Design: event-time windows + watermark bound the state store; the
  * aggregation is the same map-side-combining hash aggregate as the batch
  * twin, so a batch backfill and the streaming job produce identical
  * rows for closed windows.
  */
object EventsStream {

  /** The events schema with nanosecond timestamps as raw longs (matching
    * Events.readEvents).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Windowed count/sum per event type with a 10-minute watermark.
    * `dir` is a directory of events parquet files (files appearing later
    * are new micro-batches).
    */
  def windowedCounts(spark: SparkSession, dir: String,
                     windowDur: String = "5 minutes"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // scope the stream to the events table (glob — the source wants a
    // directory or pattern): a bare testdata dir holds OTHER tables'
    // parquet too, which a schema-pinned reader would surface as
    // all-null rows
    val stream = spark.readStream.schema(schema)
      .parquet(s"$dir/events.*")
      .withColumn("event_time",
        timestamp_micros(expr("ts div 1000")))
    stream
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Drive the stream synchronously to completion over the files already
    * in `dir` (memory sink) and return the result table — the local-smoke
    * harness for the streaming path.
    */
  def runOnce(spark: SparkSession, dir: String,
              queryName: String = "events_win"): DataFrame = {
    val q: StreamingQuery = windowedCounts(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
