package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming twins of the corpus-preparation front door
  * (graft.llm.Corpus): as documents arrive they are context-chunked
  * and screened against a STATIC benchmark probe set. Both operators
  * are stateless row-local maps, so the streaming plan is the batch
  * plan applied micro-batch by micro-batch — no state store, no
  * watermark, nothing to bound. The probe set is computed once from
  * the static benchmark corpus (benchmarks do not stream) and enters
  * the query as a broadcast-sized literal, exactly as in batch.
  */
object CorpusStream {

  private def docStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/documents.*")
  }

  /** Streaming [[graft.llm.Corpus.chunkWindows]]. */
  def chunkStream(spark: SparkSession, dir: String,
                  win: Int = 64, stride: Int = 48): DataFrame =
    graft.llm.Corpus.chunkWindows(docStream(spark, dir), win, stride)

  /** Streaming contamination screen: probe hashes from the static
    * corpus, row-local screen over the stream.
    */
  def screenStream(spark: SparkSession, dir: String): DataFrame = {
    val probe = graft.llm.Corpus.probeHashes(
      spark.read.parquet(s"$dir/documents.parquet"))
    graft.llm.Corpus.contaminationWith(docStream(spark, dir), probe)
  }

  private def runOnce(df: DataFrame, spark: SparkSession,
                      queryName: String): DataFrame = {
    val q: StreamingQuery = df.writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  def chunkOnce(spark: SparkSession, dir: String): DataFrame =
    runOnce(chunkStream(spark, dir), spark, "corpus_chunk_stream")

  def screenOnce(spark: SparkSession, dir: String): DataFrame =
    runOnce(screenStream(spark, dir), spark, "corpus_screen_stream")
}
