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

  /** Streams must pin a schema up front, but the events fixture has
    * shipped with two physical `ts` encodings (nanosecond int64 and
    * microsecond TIMESTAMP — see Events.readEvents). Discover the real
    * schema from the existing files' footers (driver-side, no data
    * scan) so the pinned stream schema always matches the bytes on
    * disk; new micro-batch files of the same table keep that schema.
    *
    * A dir with NO events files yet (the stream starting before its
    * first micro-batch lands — the "files appearing later" scenario
    * [[windowedCounts]] documents) has no footers to discover from;
    * fall back to the historical nano-long schema so the stream can
    * still start. Assumption (also Events.readEvents'): one
    * homogeneous ts encoding per directory — a dir mixing both
    * encodings would misread the minority files under the pinned
    * schema, so the discovery reads ALL matching footers (mergeSchema
    * fails loudly on a true mix rather than sampling one file).
    */
  val FallbackSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def discoverSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/events.*").schema
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null &&
            (e.getMessage.contains("Path does not exist") ||
              e.getMessage.contains("unable to infer schema") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) =>
        FallbackSchema
    }
  }

  /** Schema-adaptive streaming read of an events dir, normalised to an
    * integer `ts_us` epoch-microsecond column plus an `event_time`
    * TIMESTAMP for watermarking — the streaming twin of
    * Events.readEvents. The glob scopes the stream to the events table:
    * a bare testdata dir holds OTHER tables' parquet too, which a
    * schema-pinned reader would surface as all-null rows.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = discoverSchema(spark, dir)
    spark.readStream.schema(schema)
      .parquet(s"$dir/events.*")
      .withColumn("ts_us", graft.llm.Events.tsMicros(schema("ts").dataType))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
  }

  /** Windowed count/sum per event type with a 10-minute watermark.
    * `dir` is a directory of events parquet files (files appearing later
    * are new micro-batches).
    */
  def windowedCounts(spark: SparkSession, dir: String,
                     windowDur: String = "5 minutes"): DataFrame = {
    val stream = readEventsStream(spark, dir)
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
