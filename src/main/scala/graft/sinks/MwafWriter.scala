package graft.sinks

import java.io.BufferedOutputStream


import graft.sources.SlabIO
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One dense-grid row of the mwaf flag table. */
final case class MwafRow(cc: Long, t: Long, bl: Long, flag_mask: Long)

/** K3: mwaf-style binary flag files
  * (/root/reference/src/io/mwaf.rs): one FITS file per coarse channel
  * (template `%%` → gpubox id, mwaf.rs:105-138), header keys
  * VERSION/OBSID/GPSSTART/NCHANS/NANTENNA/NSCANS (mwaf.rs:263-349), and
  * a FLAGS bit-column table with one row per (timestep, baseline), each
  * cell a fine-channel bitvector (mwaf.rs:424-495). `finalise` verifies
  * the row count (mwaf.rs:504-510) — mirrored here by a require() —
  * and then bakes occupancy/provenance extension tables into each file
  * (mwaf.rs:512-625): CH_OCC (per-fine-channel flagged count +
  * occupancy fraction over all rows), BL_OCC (per-baseline ant pair,
  * flagged count, occupancy over timesteps·channels), and TILES
  * (antenna index → tile name). The same three tables are appended
  * here, accumulated ON THE EXECUTORS while the rows stream out (the
  * reference accumulates them in its write loop the same way,
  * mwaf.rs:452-467) — zero extra passes over the data. Extension rows
  * are big-endian fixed-width records under 2880-byte card-block
  * headers (XTENSION/EXTNAME/NAXIS2/NROWBYTE), the same GRAFT dialect
  * deviation as the primary data block (README "Format notes").
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

  private def card(key: String, value: String): String =
    (key.take(8).padTo(8, ' ') + "= " +
      value.reverse.padTo(20, ' ').reverse).padTo(80, ' ')

  /** One finalise extension table as bytes: a card-block header
    * (XTENSION/EXTNAME/NAXIS2/NROWBYTE then END, padded to 2880) and
    * `nRows` big-endian fixed-width records zero-padded to the next
    * 2880 boundary. `fill` appends record `i` to the buffer.
    */
  private def extBlock(extname: String, nRows: Int, rowBytes: Int)
      (fill: (java.nio.ByteBuffer, Int) => Unit): Array[Byte] = {
    val head = Seq(
      card("XTENSION", "'BINTABLE'"),
      card("EXTNAME", s"'$extname'"),
      card("NAXIS2", nRows.toString),
      card("NROWBYTE", rowBytes.toString),
      "END".padTo(80, ' ')).mkString
    val headPad = head + " " * ((2880 - head.length % 2880) % 2880)
    val dataLen = nRows * rowBytes
    val padded = dataLen + ((2880 - dataLen % 2880) % 2880)
    val buf = java.nio.ByteBuffer.allocate(headPad.length + padded)
    buf.put(headPad.getBytes("ASCII"))
    (0 until nRows).foreach(i => fill(buf, i))
    buf.array()
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
    // the Long bitvector carries at most 64 fine channels per coarse;
    // a wider container (legacy 10 kHz = 128) would silently wrap into
    // corrupt flag files — fail loudly until the multi-word row layout
    // exists (documented limitation, SURVEY §2.8)
    val fpc = meta.fineChansPerCoarse
    require(fpc >= 1 && fpc <= 64,
      s"mwaf writer supports at most 64 fine chans per coarse, got $fpc")
    // densify to the full (cc, t, bl) grid FROM THE METADATA SEAM —
    // the reference's tables are dense by construction; cells with NO
    // data are fully flagged (missing-HDU semantics,
    // /root/reference/src/io/mod.rs:297-303), matching GpuboxSource's
    // flag=!present on ingest
    val allFlagged = if (fpc == 64) -1L else (1L << fpc) - 1L
    val ccs = visFlagged.select("cc").distinct().as[Long].collect().sorted
    val grid = ccs.toSeq.toDF("cc")
      .crossJoin(meta.timestep(spark).select("t"))
      .crossJoin(meta.baseline(spark).select("bl"))
    val masks = grid
      .join(Sinks.mwafBitmask(visFlagged), Seq("cc", "t", "bl"), "left")
      .withColumn("flag_mask", coalesce(col("flag_mask"),
        lit(allFlagged)))
      .select("cc", "t", "bl", "flag_mask")

    val nScans = meta.nScans
    val nAnts = meta.nAnts
    val nBl = nAnts * (nAnts + 1) / 2
    val bytesPerRow = (meta.fineChansPerCoarse + 7) / 8
    // TILES provenance: container tile_name when present (real
    // metafits), else the MWA TileNNN convention — the same seam the
    // uvfits AIPS AN writer uses. Dimension-sized driver state.
    val antDf = meta.antenna(spark)
    val tileNames: Array[String] =
      (if (antDf.columns.contains("tile_name"))
         antDf.select(col("ant"), col("tile_name"))
           .as[(Long, String)].collect()
       else antDf.select(col("ant")).as[Long].collect()
         .map(a => (a, f"Tile$a%03d")))
        .sortBy(_._1).map(_._2)
    require(tileNames.length == nAnts,
      s"antenna dim has ${tileNames.length} rows, metadata says $nAnts")
    // dense (ant1 <= ant2) pair enumeration — the bl sort order
    val antPairs: Array[(Int, Int)] =
      (for (a1 <- 0 until nAnts; a2 <- a1 until nAnts)
        yield (a1, a2)).toArray
    val obsId = meta.gpsStartS.toLong
    val header = Seq(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      card("VERSION", "'2.0'"),
      card("OBSID", obsId.toString),
      card("GPSSTART", obsId.toString),
      card("NCHANS", meta.fineChansPerCoarse.toString),
      card("NANTENNA", meta.nAnts.toString),
      card("NSCANS", nScans.toString),
      "END".padTo(80, ' ')).mkString
    val headPad = header + " " * ((2880 - header.length % 2880) % 2880)
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
        def tmpPath(cc: Long) = new Path(dirPath,
          "." + template.replace("%%", cc.toString) + s".attempt$attempt")
        def finalPath(cc: Long) = new Path(dirPath,
          template.replace("%%", cc.toString))
        def closeFile(): Unit = if (out != null) {
          val dataLen = rowsInFile * bytesPerRow
          out.write(
            new Array[Byte](((2880 - dataLen % 2880) % 2880).toInt))
          // finalise (reference mwaf.rs:504-625): row-count invariant,
          // then the occupancy/provenance extension tables
          require(rowsInFile == nScans.toLong * nBl,
            s"mwaf row-count invariant: $rowsInFile != $nScans*$nBl")
          val totalRows = nScans.toLong * nBl
          out.write(extBlock("CH_OCC", fpc, 20) { (buf, i) =>
            buf.putInt(i)
            buf.putLong(chCount(i))
            buf.putDouble(chCount(i).toDouble / totalRows)
          })
          out.write(extBlock("BL_OCC", nBl, 28) { (buf, i) =>
            buf.putInt(i)
            buf.putInt(antPairs(i)._1)
            buf.putInt(antPairs(i)._2)
            buf.putLong(blCount(i))
            buf.putDouble(blCount(i).toDouble / (nScans.toLong * fpc))
          })
          out.write(extBlock("TILES", nAnts, 12) { (buf, i) =>
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
            out.write(headPad.getBytes("ASCII"))
          }
          var b = 0
          while (b < bytesPerRow) {
            out.write(((r.flag_mask >> (8 * b)) & 0xff).toInt)
            b += 1
          }
          // occupancy accumulation: rows stream in (t, bl) order, so
          // the dense baseline index is rowsInFile mod nBl
          var ch = 0
          while (ch < fpc) {
            chCount(ch) += (r.flag_mask >> ch) & 1L
            ch += 1
          }
          blCount((rowsInFile % nBl).toInt) +=
            java.lang.Long.bitCount(r.flag_mask)
          rowsInFile += 1
        }
        closeFile()
        done.iterator
      }
      .collect()
    counts.toMap
  }
}
