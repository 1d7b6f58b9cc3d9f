package graft.streaming

import graft.model.Dims
import graft.ops.{Averaging, CableCorrection, DigitalGains}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming twin of the visibility preprocessing chain —
  * continuous ingestion of correlator output with the SAME operator
  * objects the batch pipeline uses.
  *
  * What transfers for free: every correction that is a stateless
  * projection + static broadcast join (C1 cable, C3 digital gains —
  * and C4/C6 identically) runs unchanged on an unbounded frame
  * (stream-static joins), and the averaging group-by is the standard
  * streaming aggregate. What does NOT: Van Vleck's σ-table derivation
  * aggregates the stream and re-joins it to itself (stream-stream on
  * derived state) — a production deployment derives σ per micro-batch
  * with `foreachBatch`, reusing the same batch operator.
  *
  * The parity spec proves closed results equal the batch chain
  * cell-for-cell — batch backfill ≡ streaming, the property a
  * continuously-ingesting telescope pipeline needs.
  */
object VisStream {

  /** Long-format weighted vis schema (the K-mirror / post-flag shape). */
  val schema: StructType = StructType(
    Seq(StructField("t", LongType), StructField("ant1", LongType),
      StructField("ant2", LongType), StructField("bl", LongType),
      StructField("cc", LongType), StructField("fc", LongType),
      StructField("chan", LongType), StructField("freq_hz", DoubleType)) ++
      (0 until 8).map(k => StructField(s"v$k", DoubleType)) ++
      Seq(StructField("w", DoubleType), StructField("flag", BooleanType),
        StructField("weight", DoubleType)))

  /** The stateless correction chain over a (possibly unbounded) frame. */
  def corrected(spark: SparkSession, vis: DataFrame): DataFrame =
    DigitalGains(CableCorrection(vis, Dims.antenna(spark)),
      Dims.digitalGain(spark))

  /** Corrections + 2x/2x averaging over a streamed weighted-vis mirror
    * (complete mode: the averaging groups are keyed by data, not event
    * time — a watermarked deployment would key windows on ingestion
    * time).
    */
  def runOnce(spark: SparkSession, visDir: String,
              queryName: String = "vis_stream"): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(visDir)
    val avg = Averaging.avgTimeFreq(corrected(spark, stream), 2, 2)
    val q: StreamingQuery = avg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
