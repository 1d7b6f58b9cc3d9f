package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`) — what is real and
  * tested is the Spark-side shape: binary column handling, the
  * mapPartitions batch contract (the Scala analogue of `mapInPandas`:
  * one iterator in, batched feature rows out, no per-row JVM boundary
  * crossing), partitioning, and the output schema a downstream trainer
  * would consume.
  */
object Multimodal {

  /** A decoded media batch row: fixed metadata + a small feature vector. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, n_frames: Int,
                           features: Array[Float])

  /** STUB decode: a real implementation would parse the container format
    * (JPEG/WAV/MP4) from the byte payload. This deterministic fake derives
    * plausible metadata and an 8-dim "feature vector" from the bytes so
    * the pipeline shape is end-to-end testable.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val w = 16 + (docId % 32).toInt
    val h = 16 + ((docId * 7) % 32).toInt
    val frames = 1 + (docId % 4).toInt
    val feats = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < payload.length) { acc += payload(j) & 0xff; j += 8 }
      (acc % 1024).toFloat / 1024f
    }
    MediaFeatures(docId, n, w, h, frames, feats)
  }

  /** Treat `text` as the opaque binary payload column and run the decode
    * stub per partition in batches. The physical shape is the one that
    * matters at 100 TB: binary stays columnar until the partition
    * iterator, features come back as a typed Dataset.
    */
  def extractFeatures(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: in a codec-backed implementation each batch would be
        // handed to the native decoder in one call
        it.grouped(64).flatMap(_.map { case (id, bytes) =>
          decodeStub(id, bytes)
        })
      }
  }

  /** Metadata-only projection (oracle-checkable): byte length + stub
    * dimensions, no decode.
    */
  def metadata(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (lit(16) + col("doc_id") % 32).cast("long").as("stub_w"),
      (lit(16) + (col("doc_id") * 7) % 32).cast("long").as("stub_h"),
      (lit(1) + col("doc_id") % 4).cast("long").as("n_frames"))

  /** Frame sampling: one output row per kept frame (every `everyN`-th,
    * frame 0 always kept) — the explode-shaped video preprocessing step.
    * The frame PAYLOAD extraction is the codec-backed part a real
    * deployment plugs into [[extractFeatures]]'s batch loop; the
    * dataflow (per-frame fan-out, metadata carry) is the Spark-side
    * contract and is fully gated.
    */
  def frameSample(docs: DataFrame, everyN: Int = 2): DataFrame =
    metadata(docs).select(col("doc_id"), col("n_frames"),
      explode(expr(s"sequence(0L, n_frames - 1, $everyN)"))
        .as("frame_idx"))

  /** Resize planning: target dimensions + exact rational scale factors
    * per document (the shape every batch image-resize kernel consumes;
    * the pixel transform itself is the stubbed codec step). Scales are
    * rounded to 6 dp for cross-engine hashing.
    */
  def resizePlan(docs: DataFrame, outW: Int = 224,
                 outH: Int = 224): DataFrame =
    metadata(docs).select(
      col("doc_id"), col("stub_w"), col("stub_h"),
      lit(outW.toLong).as("out_w"), lit(outH.toLong).as("out_h"),
      round(lit(outW.toDouble) / col("stub_w").cast("double"), 6)
        .as("scale_x"),
      round(lit(outH.toDouble) / col("stub_h").cast("double"), 6)
        .as("scale_y"))
}
