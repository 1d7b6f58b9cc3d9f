package graft.sources

import java.nio.ByteBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared slab-file IO for the binary sources. Listing and positioned
  * reads go through the Hadoop FileSystem API, so `file://`, `hdfs://`
  * and `s3a://` paths all work — the driver lists, each task opens its
  * own handle, and reads are slab-sized (memory O(slab), never
  * O(file)). The close-on-exhaust adapter also registers a task
  * completion listener, so a partially-consumed iterator (limit(1),
  * task kill) still releases the file handle.
  */
object SlabIO {

  /** List `suffix`-matching files directly under `dir`, sorted. */
  def listPaths(dir: String, suffix: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(suffix)).sorted
  }

  /** Positioned reader over any Hadoop filesystem. */
  final class SlabReader(path: String) {
    private val p = new Path(path)
    private val fs = p.getFileSystem(new Configuration())
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
