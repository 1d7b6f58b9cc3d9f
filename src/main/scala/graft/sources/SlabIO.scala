package graft.sources

import java.nio.ByteBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared slab-file IO for the binary sources. Listing and positioned
  * reads go through the Hadoop FileSystem API, so `file://`, `hdfs://`
  * and `s3a://` paths all work — the driver lists, each task opens its
  * own handle, and reads are slab-sized (memory O(slab), never
  * O(file)). The close-on-exhaust adapter also registers a task
  * completion listener, so a partially-consumed iterator (limit(1),
  * task kill) still releases the file handle.
  *
  * All entry points take the SESSION's Hadoop configuration (driver) or
  * Spark's `SerializableConfiguration` wrapper shipped through task
  * closures (executors) — a bare `new Configuration()` would drop
  * every `spark.hadoop.*` setting (s3a credentials/endpoint, hdfs
  * nameservices) the user configured on the session.
  */
object SlabIO {

  /** The session's Hadoop conf wrapped for closure capture — Spark's
    * own public serializable envelope.
    */
  def serializableConf(spark: SparkSession)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

  /** List `suffix`-matching files directly under `dir`, sorted — with
    * the session's Hadoop configuration (driver side).
    */
  def listPaths(spark: SparkSession, dir: String,
                suffix: String): Seq[String] =
    listPaths(dir, suffix, spark.sparkContext.hadoopConfiguration)

  def listPaths(dir: String, suffix: String,
                conf: Configuration): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(suffix)).sorted
  }

  /** Positioned reader over any Hadoop filesystem. */
  final class SlabReader(path: String, conf: Configuration) {
    // local-only convenience for specs/tools; production paths pass the
    // session conf so remote filesystems keep their credentials
    def this(path: String) = this(path, new Configuration())

    private val p = new Path(path)
    private val fs = p.getFileSystem(conf)
    val size: Long = fs.getFileStatus(p).getLen
    private val in = fs.open(p)

    /** Read `len` bytes at `pos`; bytes past EOF stay zero (callers
      * bound their reads with [[size]], so a short tail is a caller
      * decision, not silent corruption).
      */
    def readAt(pos: Long, len: Int): ByteBuffer = {
      val arr = new Array[Byte](len)
      val n = math.min(len.toLong, math.max(size - pos, 0L)).toInt
      if (n > 0) in.readFully(pos, arr, 0, n)
      ByteBuffer.wrap(arr)
    }

    def close(): Unit = in.close()
  }

  /** Invoke `close` once the iterator is exhausted, and on task
    * completion regardless — whichever comes first.
    */
  def closeOnExhaust[T](it: Iterator[T])(close: () => Unit)
      : Iterator[T] = {
    var closed = false
    def doClose(): Unit = if (!closed) { closed = true; close() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => doClose()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) doClose()
        h
      }
      def next(): T = it.next()
    }
  }
}
