package graft.sinks

import java.io.BufferedOutputStream


import graft.sources.SlabIO
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One dense-grid row of the mwaf flag table; `flag_words` is the
  * 32-chans-per-word bitvector ([[Sinks.MwafWordChans]]).
  */
final case class MwafRow(cc: Long, t: Long, bl: Long,
                         flag_words: Seq[Long])

/** K3: mwaf binary flag files
  * (/root/reference/src/io/mwaf.rs): one FITS file per coarse channel
  * (template `%%` → gpubox id, mwaf.rs:105-138), a primary HDU carrying
  * VERSION/OBSID/GPSSTART/NCHANS/NANTENNA/NSCANS (mwaf.rs:263-349), a
  * FLAGS binary table with one row per (timestep, baseline), each cell
  * a fine-channel bit-array column (TFORM `nX`, mwaf.rs:424-495), and —
  * baked in at `finalise` after the row count is verified
  * (mwaf.rs:504-510) — three occupancy/provenance extension tables
  * (mwaf.rs:512-625): CH_OCC (Index/Count/Occupancy per fine channel),
  * BL_OCC (Index/Antenna1/Antenna2/Count/Occupancy per baseline) and
  * TILES (Antenna/TileName). All four tables are written as
  * STANDARD-CONFORMING FITS BINTABLE extensions (fixed-format cards,
  * XTENSION/BITPIX/NAXIS1/NAXIS2/PCOUNT/GCOUNT/TFIELDS/TTYPEn/TFORMn/
  * EXTNAME, big-endian column payloads, 2880-byte block alignment) with
  * the reference's column names and types, so an astropy-class FITS
  * reader parses them exactly as it parses the reference's files. Bit
  * columns follow the FITS `X` convention: the first bit of the field
  * is the MOST significant bit of the first byte (cfitsio ffpclx
  * packing, used by the reference's writer at mwaf.rs:474-482).
  *
  * The occupancy tables are accumulated ON THE EXECUTORS while the
  * rows stream out (the reference accumulates them in its write loop
  * the same way, mwaf.rs:452-467) — zero extra passes over the data.
  *
  * Fully distributed: the bit-packing runs in the
  * [[Sinks.mwafBitmask]] aggregate, and the per-coarse-channel files are
  * encoded and written ON THE EXECUTORS — `repartition(cc)` puts each
  * coarse channel's dense grid in exactly one partition, sorted
  * (cc, t, bl), and the partition streams its channels straight to
  * their files (the reference writes its per-gpubox files in parallel
  * the same way, mwaf.rs:399-417). No flag byte ever crosses the
  * driver.
  *
  * Filesystem contract: all IO goes through the Hadoop FileSystem API
  * with the SESSION's configuration, so `dir` may be `file://` (shared
  * mount), `hdfs://`, or any FS with a registered AbstractFileSystem.
  * The crash-safety commit (attempt-unique temp + rename-overwrite) is
  * atomic exactly where the FS's rename is atomic — posix and HDFS yes,
  * object stores no; on s3a-like stores, point `dir` at a staging FS
  * and upload the finished files, as with any rename-committed output.
  */
object MwafWriter {

  /** Fixed-format FITS card with a right-justified value (integers,
    * logicals) in columns 11–30.
    */
  private def card(key: String, value: String): String =
    (key.take(8).padTo(8, ' ') + "= " +
      value.reverse.padTo(20, ' ').reverse).padTo(80, ' ')

  /** Fixed-format FITS card with a quoted string value starting at
    * column 11, padded to the standard's 8-char minimum.
    */
  private def cardStr(key: String, value: String): String =
    (key.take(8).padTo(8, ' ') + "= '" + value.padTo(8, ' ') + "'")
      .padTo(80, ' ')

  private def pad2880(s: String): Array[Byte] =
    (s + " " * ((2880 - s.length % 2880) % 2880)).getBytes("ASCII")

  /** Conforming BINTABLE extension header: mandatory cards in the
    * standard's order, one TTYPE/TFORM pair per field, EXTNAME, END.
    */
  private def binTableHeader(extname: String, nRows: Long, rowBytes: Int,
                             fields: Seq[(String, String)]): Array[Byte] = {
    val cards = Seq(
      cardStr("XTENSION", "BINTABLE"),
      card("BITPIX", "8"),
      card("NAXIS", "2"),
      card("NAXIS1", rowBytes.toString),
      card("NAXIS2", nRows.toString),
      card("PCOUNT", "0"),
      card("GCOUNT", "1"),
      card("TFIELDS", fields.length.toString)) ++
      fields.zipWithIndex.flatMap { case ((ttype, tform), i) =>
        Seq(cardStr(s"TTYPE${i + 1}", ttype),
          cardStr(s"TFORM${i + 1}", tform))
      } ++ Seq(cardStr("EXTNAME", extname), "END".padTo(80, ' '))
    pad2880(cards.mkString)
  }

  /** One finalise extension table as bytes: conforming BINTABLE header
    * then `nRows` big-endian fixed-width records zero-padded to the
    * next 2880 boundary. `fill` appends record `i` to the buffer.
    */
  private def extBlock(extname: String, nRows: Int, rowBytes: Int,
                       fields: Seq[(String, String)])
      (fill: (java.nio.ByteBuffer, Int) => Unit): Array[Byte] = {
    val head = binTableHeader(extname, nRows.toLong, rowBytes, fields)
    val dataLen = nRows * rowBytes
    val padded = dataLen + ((2880 - dataLen % 2880) % 2880)
    val buf = java.nio.ByteBuffer.allocate(head.length + padded)
    buf.put(head)
    (0 until nRows).foreach(i => fill(buf, i))
    buf.array()
  }

  /** Pack a fine-channel flag bitvector (bit `ch mod 32` of word
    * `ch div 32` = channel `ch` flagged, [[Sinks.MwafWordChans]]
    * layout) into FITS `X`-column bytes: channel `8b+k` lands in byte
    * `b` at bit `7-k` (first bit = MSB of first byte, the cfitsio
    * packing). Arbitrary width — legacy 10 kHz containers carry 128
    * fine channels per coarse (reference FLAGS cell is a fine-chan
    * bitvector of any width, /root/reference/src/io/mwaf.rs:424-495).
    */
  def packBits(words: Seq[Long], fpc: Int, out: Array[Byte]): Unit = {
    val wc = Sinks.MwafWordChans
    var b = 0
    val n = (fpc + 7) / 8
    while (b < n) {
      var byte = 0
      var k = 0
      while (k < 8) {
        val ch = 8 * b + k
        if (ch < fpc && ((words(ch / wc) >> (ch % wc)) & 1L) == 1L)
          byte |= 1 << (7 - k)
        k += 1
      }
      out(b) = byte.toByte
      b += 1
    }
  }

  /** Write one file per coarse channel into `dir`, named
    * `flags_%%.mwaf` with %% = coarse channel id. Returns rows written
    * per cc.
    */
  def write(visFlagged: DataFrame, dir: String,
            template: String = "flags_%%.mwaf",
            meta: graft.model.MetaSource = graft.model.SynthDims)
      : Map[Long, Long] = {
    val spark = visFlagged.sparkSession
    import spark.implicits._
    // arbitrary width via the 32-chans-per-word container (legacy
    // 10 kHz observations carry 128 fine channels per coarse; the
    // reference's FLAGS bit-column is arbitrary-width, mwaf.rs:424-495)
    val fpc = meta.fineChansPerCoarse
    require(fpc >= 1, s"fpc must be >= 1, got $fpc")
    // densify to the full (cc, t, bl) grid FROM THE METADATA SEAM —
    // the reference's tables are dense by construction; cells with NO
    // data are fully flagged (missing-HDU semantics,
    // /root/reference/src/io/mod.rs:297-303), matching GpuboxSource's
    // flag=!present on ingest
    val allFlagged = Sinks.mwafFullWords(fpc)
    val ccs = visFlagged.select("cc").distinct().as[Long].collect().sorted
    val grid = ccs.toSeq.toDF("cc")
      .crossJoin(meta.timestep(spark).select("t"))
      .crossJoin(meta.baseline(spark).select("bl"))
    val masks = grid
      .join(Sinks.mwafBitmask(visFlagged, fpc), Seq("cc", "t", "bl"),
        "left")
      .withColumn("flag_words", coalesce(col("flag_words"),
        array(allFlagged.map(lit): _*)))
      .select("cc", "t", "bl", "flag_words")

    val nScans = meta.nScans
    val nAnts = meta.nAnts
    val nBl = nAnts * (nAnts + 1) / 2
    val bytesPerRow = (fpc + 7) / 8
    // TILES provenance: container tile_name when the seam provides an
    // antenna dim (real metafits), else the MWA TileNNN convention
    // derived from nAnts alone — mwaf writing itself must keep needing
    // only the timestep/baseline dims (MwafForeignSpec's contract).
    val tileNames: Array[String] = meta.antennaOpt(spark) match {
      case Some(antDf) if antDf.columns.contains("tile_name") =>
        antDf.select(col("ant"), col("tile_name"))
          .as[(Long, String)].collect().sortBy(_._1).map(_._2)
      case Some(antDf) =>
        antDf.select(col("ant")).as[Long].collect().sorted
          .map(a => f"Tile$a%03d")
      case None =>
        Array.tabulate(nAnts)(a => f"Tile$a%03d")
    }
    require(tileNames.length == nAnts,
      s"antenna dim has ${tileNames.length} rows, metadata says $nAnts")
    // dense (ant1 <= ant2) pair enumeration — the bl sort order
    val antPairs: Array[(Int, Int)] =
      (for (a1 <- 0 until nAnts; a2 <- a1 until nAnts)
        yield (a1, a2)).toArray
    val obsId = meta.gpsStartS.toLong
    // primary HDU: NAXIS=0 + the reference's observation keys
    // (mwaf.rs:293-310; GPSSTART written as a string there too)
    val primary = pad2880(Seq(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      card("EXTEND", "T"),
      cardStr("VERSION", "2.0"),
      card("OBSID", obsId.toString),
      cardStr("GPSSTART", obsId.toString),
      card("NCHANS", fpc.toString),
      card("NANTENNA", nAnts.toString),
      card("NSCANS", nScans.toString),
      card("NPOLS", "1"),
      cardStr("SOFTWARE", "graft"),
      "END".padTo(80, ' ')).mkString)
    val flagsHead = binTableHeader("FLAGS", nScans.toLong * nBl,
      bytesPerRow, Seq(("FLAGS", s"${fpc}X")))
    val sconf = SlabIO.serializableConf(spark)

    // hash-partition on cc: every coarse channel lands whole in one
    // partition (several may share one — the file-switch loop handles
    // that), so each task writes complete files with zero coordination
    val counts = masks
      .repartition(math.max(ccs.length, 1), col("cc"))
      .sortWithinPartitions("cc", "t", "bl")
      .as[MwafRow]
      .mapPartitions { rows =>
        val conf = sconf.value
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(conf)
        // task retries / speculative attempts must not interleave
        // writes into one file: each attempt writes attempt-unique
        // temp files and rename-overwrites on completion — last
        // finished attempt wins whole files (atomic where the FS's
        // rename is, see object scaladoc)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        // a failed attempt must not orphan its in-flight temp file
        var inFlight: Option[Path] = None
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskFailureListener((_, _) =>
            inFlight.foreach(p => fs.delete(p, false))))
        val done = scala.collection.mutable.Map[Long, Long]()
        var out: BufferedOutputStream = null
        var curCc = -1L
        var rowsInFile = 0L
        // finalise-state accumulated while rows stream out (reference
        // mwaf.rs:452-467 keeps the same two counters in its loop)
        val chCount = new Array[Long](fpc)
        val blCount = new Array[Long](nBl)
        val rowBuf = new Array[Byte](bytesPerRow)
        def tmpPath(cc: Long) = new Path(dirPath,
          "." + template.replace("%%", cc.toString) + s".attempt$attempt")
        def finalPath(cc: Long) = new Path(dirPath,
          template.replace("%%", cc.toString))
        def closeFile(): Unit = if (out != null) {
          val dataLen = rowsInFile * bytesPerRow
          out.write(
            new Array[Byte](((2880 - dataLen % 2880) % 2880).toInt))
          // finalise (reference mwaf.rs:504-625): row-count invariant,
          // then the occupancy/provenance extension tables with the
          // reference's exact column names/types (mwaf.rs:547-624)
          require(rowsInFile == nScans.toLong * nBl,
            s"mwaf row-count invariant: $rowsInFile != $nScans*$nBl")
          val totalRows = nScans.toLong * nBl
          out.write(extBlock("CH_OCC", fpc, 20, Seq(
            ("Index", "1J"), ("Count", "1K"), ("Occupancy", "1D"))) {
            (buf, i) =>
              buf.putInt(i)
              buf.putLong(chCount(i))
              buf.putDouble(chCount(i).toDouble / totalRows)
          })
          out.write(extBlock("BL_OCC", nBl, 28, Seq(
            ("Index", "1J"), ("Antenna1", "1J"), ("Antenna2", "1J"),
            ("Count", "1K"), ("Occupancy", "1D"))) { (buf, i) =>
            buf.putInt(i)
            buf.putInt(antPairs(i)._1)
            buf.putInt(antPairs(i)._2)
            buf.putLong(blCount(i))
            buf.putDouble(blCount(i).toDouble / (nScans.toLong * fpc))
          })
          out.write(extBlock("TILES", nAnts, 12, Seq(
            ("Antenna", "1J"), ("TileName", "8A"))) { (buf, i) =>
            buf.putInt(i)
            buf.put(tileNames(i).take(8).padTo(8, ' ').getBytes("ASCII"))
          })
          out.close()
          FileContext.getFileContext(dirPath.toUri, conf)
            .rename(tmpPath(curCc), finalPath(curCc),
              Options.Rename.OVERWRITE)
          inFlight = None
          done(curCc) = rowsInFile
        }
        rows.foreach { r =>
          if (r.cc != curCc) {
            closeFile()
            curCc = r.cc
            rowsInFile = 0
            java.util.Arrays.fill(chCount, 0L)
            java.util.Arrays.fill(blCount, 0L)
            inFlight = Some(tmpPath(curCc))
            out = new BufferedOutputStream(
              fs.create(tmpPath(curCc), true), 1 << 16)
            out.write(primary)
            out.write(flagsHead)
          }
          packBits(r.flag_words, fpc, rowBuf)
          out.write(rowBuf)
          // occupancy accumulation: rows stream in (t, bl) order, so
          // the dense baseline index is rowsInFile mod nBl
          val wc = Sinks.MwafWordChans
          var ch = 0
          var bits = 0L
          while (ch < fpc) {
            val bit = (r.flag_words(ch / wc) >> (ch % wc)) & 1L
            chCount(ch) += bit
            bits += bit
            ch += 1
          }
          blCount((rowsInFile % nBl).toInt) += bits
          rowsInFile += 1
        }
        closeFile()
        done.iterator
      }
      .collect()
    counts.toMap
  }
}
