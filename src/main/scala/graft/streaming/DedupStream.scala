package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming twin of exact deduplication
  * (graft.llm.Dedup.exact): continuous ingestion keeps only the first
  * occurrence of each content hash — the always-on front door of a
  * training-data pipeline, where the batch job is the backfill.
  *
  * Design: `dropDuplicates` on the content hash with UNBOUNDED state —
  * exact global dedup requires remembering every key ever seen, the
  * same invariant the batch hash aggregate holds in its shuffle. (A
  * watermarked variant bounds the store but re-emits a key whose state
  * was evicted — it trades exactness for memory, and the spec shows the
  * unbounded form is the one that matches the batch twin.) At corpus
  * scale the state store is RocksDB-backed and distinct-hash-sized —
  * the same cardinality the batch job shuffles.
  */
object DedupStream {

  /** First occurrence per content hash over a streamed events dir —
    * the `props` JSON column is the payload (genuine duplicates at
    * realistic cardinality, unlike the handful-valued event_type).
    */
  def dedupByContent(spark: SparkSession, dir: String): DataFrame = {
    EventsStream.readEventsStream(spark, dir)
      .withColumn("content_hash", md5(col("props")))
      .dropDuplicates("content_hash")
      .select("content_hash", "props")
  }

  def runOnce(spark: SparkSession, dir: String,
              queryName: String = "dedup_stream"): DataFrame =
    StreamDrain.runOnce(dedupByContent(spark, dir), queryName)

  /** Bloom-screened ingestion — the BOUNDED-state counterpart of
    * [[dedupByContent]]'s unbounded store: arriving documents are
    * probed row-locally against a prebuilt fixed-size filter of the
    * already-ingested corpus ([[graft.llm.Dedup.bloomModel]]). No
    * state store at all — the filter is m/8 bytes of model state
    * baked into the plan, rebuilt per ingest epoch by the batch half —
    * so the stage is a stateless projection (append mode, any
    * trigger); the price is the filter's quantified FPR ≈ fill^k
    * instead of exactness, which is the trade a 100 TB/day front door
    * actually takes.
    */
  def bloomProbeStream(spark: SparkSession, dir: String,
                       model: graft.llm.Dedup.BloomModel): DataFrame =
    graft.llm.Dedup.bloomProbeWith(
      CorpusStream.docStream(spark, dir), model)

  def bloomProbeOnce(spark: SparkSession, dir: String,
                     model: graft.llm.Dedup.BloomModel): DataFrame =
    StreamDrain.runOnce(bloomProbeStream(spark, dir, model),
      "bloom_probe_stream")
}
