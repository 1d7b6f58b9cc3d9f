package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

/** Shared one-shot drain for the dev/spec entry points of the
  * streaming twins: start a memory sink, process everything currently
  * available, stop, and hand back the sink table. (Production runs
  * keep the query open; this is the bounded-fixture harness shape.)
  */
private[streaming] object StreamDrain {
  def runOnce(df: Dataset[_], queryName: String,
              mode: String = "append"): DataFrame = {
    val spark = df.sparkSession
    val q: StreamingQuery = df.writeStream.outputMode(mode)
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
