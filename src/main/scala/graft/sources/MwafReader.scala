package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S4 (container form): read mwaf flag files back into the flag-mask
  * frame — the parse twin of [[graft.sinks.MwafWriter]] (reference
  * reads its own mwaf output the same way in the round-trip tests,
  * /root/reference/src/io/mwaf.rs:513-599).
  *
  * Layout recap (one FITS file per coarse channel, `flags_<cc>.mwaf`):
  * a primary header (2880-byte card blocks to END) carrying
  * NCHANS (fine chans per coarse), NANTENNA, NSCANS; then the dense
  * flag table — NSCANS·nBaselines rows in (t, bl-ascending) order,
  * each row ceil(NCHANS/8) bytes of little-endian fine-channel
  * bitmask. Baseline ids enumerate (ant1 ≤ ant2) pairs ascending by
  * ant1·NANTENNA + ant2 — the same dense grid the writer emits.
  *
  * Scale shape: one task per file; each task streams its rows through
  * a positioned reader (memory O(row)). File count = coarse channels,
  * the same parallelism as the writer's one-partition-per-cc encode.
  */
object MwafReader {

  val schema: StructType = StructType(Seq(
    StructField("cc", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("bl", LongType, nullable = false),
    StructField("flag_mask", LongType, nullable = false),
    StructField("n_chans", LongType, nullable = false)))

  final case class Header(nChans: Int, nAnts: Int, nScans: Int,
                          dataStart: Long)

  /** Parse the primary header card blocks. */
  def readHeader(rd: SlabIO.SlabReader): Header = {
    val cards = scala.collection.mutable.Map[String, String]()
    var pos = 0L
    var ended = false
    while (!ended) {
      require(pos + 2880 <= rd.size, "unterminated mwaf header")
      val text = new String(rd.readAt(pos, 2880).array(), "ASCII")
      (0 until 36).foreach { i =>
        val card = text.substring(i * 80, (i + 1) * 80)
        val key = card.take(8).trim
        if (key == "END") ended = true
        else if (!ended && card.length > 9 && card.charAt(8) == '=')
          cards(key) = card.substring(10).takeWhile(_ != '/').trim
      }
      pos += 2880
    }
    Header(
      nChans = cards("NCHANS").toInt,
      nAnts = cards("NANTENNA").toInt,
      nScans = cards("NSCANS").toInt,
      dataStart = pos)
  }

  /** Ascending baseline ids of the dense (ant1 ≤ ant2) grid. */
  def baselineIds(nAnts: Int): Array[Long] =
    (for (a1 <- 0 until nAnts; a2 <- a1 until nAnts)
      yield (a1 * nAnts + a2).toLong).toArray

  /** Decode one mwaf file into (cc, t, bl, flag_mask, n_chans) rows. */
  def decodeFile(path: String, cc: Long,
                 conf: org.apache.hadoop.conf.Configuration)
      : Iterator[Row] = {
    val rd = new SlabIO.SlabReader(path, conf)
    val h = readHeader(rd)
    // the Long flag_mask column holds at most 64 fine channels; a
    // wider file would silently drop bits past the 8th byte — fail
    // loudly (matching the writer's guard)
    require(h.nChans >= 1 && h.nChans <= 64,
      s"mwaf reader supports at most 64 fine chans per coarse, " +
        s"got ${h.nChans} in $path")
    val bls = baselineIds(h.nAnts)
    val nBl = bls.length
    val bytesPerRow = (h.nChans + 7) / 8
    val nRows = h.nScans.toLong * nBl
    require(h.dataStart + nRows * bytesPerRow <= rd.size,
      s"mwaf truncated: $path declares $nRows rows")
    val iter = (0L until nRows).iterator.map { idx =>
      val buf = rd.readAt(h.dataStart + idx * bytesPerRow, bytesPerRow)
      var mask = 0L
      var b = 0
      while (b < bytesPerRow) {
        mask |= (buf.get(b) & 0xffL) << (8 * b)
        b += 1
      }
      Row(cc, idx / nBl, bls((idx % nBl).toInt), mask,
        h.nChans.toLong)
    }
    SlabIO.closeOnExhaust(iter)(() => rd.close())
  }

  /** Read every `flags_<cc>.mwaf` under `dir` into one DataFrame. */
  def read(spark: SparkSession, dir: String,
           template: String = "flags_%%.mwaf"): DataFrame = {
    val conf0 = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf0)
    // quote the literal template segments so e.g. the "." in ".mwaf"
    // can't match arbitrary characters
    val pattern = template.split("%%", -1)
      .map(java.util.regex.Pattern.quote)
      .mkString("([0-9]+)").r
    val files = fs.listStatus(d).toSeq
      .map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case pattern(cc) => Some((p.toString, cc.toLong))
          case _ => None
        }
      }
      .sortBy(_._2)
    require(files.nonEmpty, s"no ${template} files under $dir")
    val sconf = SlabIO.serializableConf(spark)
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { case (path, cc) => decodeFile(path, cc, sconf.value) }
    spark.createDataFrame(rows, schema)
  }
}
