package graft.sinks

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.model.Obs
import graft.sources.SlabIO
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.IOUtils
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K2 (container form): a Measurement-Set-shaped DIRECTORY export —
  * the casacore table layout (one directory per table: `table.info`,
  * `table.dat` descriptor, `table.f0` row data, one subdirectory per
  * subtable), fed from the same frames as the parquet mirror
  * ([[MsWriter]]; reference `write_ms`,
  * /root/reference/src/io/mod.rs:542-595, table init :575-586).
  *
  * Format contract (documented here, self-describing, little-endian —
  * casacore's byte order): `table.dat` holds a simplified TableDesc:
  * magic "GRAFTMS1", int32 column count, int64 row count, then per
  * column int16 name-length + ASCII name, int8 type code, int32
  * element count. `table.f0` holds rows in MS row order (time-major,
  * then baseline — the order the reference's writer emits and
  * `q_k2_ms_order` gates), each row a fixed-width concatenation of its
  * column cells. Type codes: 1=int32, 2=int64, 3=float32, 4=float64,
  * 5=bool(1B), 6=complex64 (float32 re,im pairs), 10=fixed 16-byte
  * ASCII. This is the casacore SHAPE (directory, descriptor file,
  * single storage-manager data file, row-major fixed buckets), not the
  * AipsIO byte encoding — a casacore-linked tool still needs the
  * parquet mirror, but any standalone reader can consume this from the
  * spec in this scaladoc alone.
  *
  * Scale shape: MAIN rows are encoded ON THE EXECUTORS — the frame
  * arrives with the range-partitioned global `row_idx`
  * ([[Sinks.orderedRowIdx]]); each partition writes its fixed-width
  * slice as a part file and the driver assembles header + parts with
  * a byte-level stream (same contract as [[UvfitsWriter]]'s tail).
  * Subtables are dimension-sized and driver-written.
  */
object MsContainer {

  final case class Col(name: String, typeCode: Byte, elems: Int)

  def cellWidth(typeCode: Byte): Int = typeCode match {
    case 1 => 4; case 2 => 8; case 3 => 4; case 4 => 8; case 5 => 1
    case 6 => 8; case 10 => 1
    case other => sys.error(s"unknown MS column type code $other")
  }

  def rowWidth(cols: Seq[Col]): Int =
    cols.map(c => cellWidth(c.typeCode) * c.elems).sum

  /** Serialize the table.dat descriptor. */
  def descriptor(cols: Seq[Col], nRows: Long): Array[Byte] = {
    val names = cols.map(_.name.getBytes("ASCII"))
    val size = 8 + 4 + 8 + cols.zip(names)
      .map { case (_, n) => 2 + n.length + 1 + 4 }.sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GRAFTMS1".getBytes("ASCII"))
    buf.putInt(cols.length)
    buf.putLong(nRows)
    cols.zip(names).foreach { case (c, n) =>
      buf.putShort(n.length.toShort)
      buf.put(n)
      buf.put(c.typeCode)
      buf.putInt(c.elems)
    }
    buf.array()
  }

  /** Parse a table.dat descriptor back. */
  def parseDescriptor(bytes: Array[Byte]): (Seq[Col], Long) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](8)
    buf.get(magic)
    require(new String(magic, "ASCII") == "GRAFTMS1",
      "not a graft MS descriptor")
    val nCols = buf.getInt()
    val nRows = buf.getLong()
    val cols = (0 until nCols).map { _ =>
      val n = new Array[Byte](buf.getShort().toInt)
      buf.get(n)
      Col(new String(n, "ASCII"), buf.get(), buf.getInt())
    }
    (cols, nRows)
  }

  // ---- column sets -----------------------------------------------------

  /** MS2 MAIN columns this container carries (names are the standard
    * MeasurementSet v2 MAIN-table columns).
    */
  def mainCols(nChan: Int): Seq[Col] = Seq(
    Col("TIME", 4, 1), Col("ANTENNA1", 1, 1), Col("ANTENNA2", 1, 1),
    Col("UVW", 4, 3), Col("INTERVAL", 4, 1), Col("EXPOSURE", 4, 1),
    Col("FLAG_ROW", 5, 1), Col("DATA_DESC_ID", 1, 1),
    Col("FIELD_ID", 1, 1), Col("SCAN_NUMBER", 1, 1),
    Col("DATA", 6, nChan * 4), Col("WEIGHT_SPECTRUM", 3, nChan * 4),
    Col("FLAG", 5, nChan * 4))

  val antennaCols: Seq[Col] = Seq(
    Col("NAME", 10, 16), Col("STATION", 10, 16), Col("MOUNT", 10, 16),
    Col("POSITION", 4, 3), Col("DISH_DIAMETER", 4, 1))

  def spwCols(nChan: Int): Seq[Col] = Seq(
    Col("NUM_CHAN", 1, 1), Col("CHAN_FREQ", 4, nChan),
    Col("CHAN_WIDTH", 4, nChan), Col("TOTAL_BANDWIDTH", 4, 1),
    Col("REF_FREQUENCY", 4, 1))

  val polCols: Seq[Col] = Seq(Col("NUM_CORR", 1, 1), Col("CORR_TYPE", 1, 4))

  val fieldCols: Seq[Col] = Seq(Col("NAME", 10, 16),
    Col("PHASE_DIR", 4, 2))

  val observationCols: Seq[Col] = Seq(Col("TELESCOPE_NAME", 10, 16),
    Col("OBSERVER", 10, 16), Col("TIME_RANGE", 4, 2))

  // ---- encoding helpers --------------------------------------------------

  private def putStr16(buf: ByteBuffer, s: String): Unit = {
    val b = s.getBytes("ASCII").take(16).padTo(16, ' '.toByte)
    buf.put(b)
  }

  private def writeTableFiles(dir: Path, cols: Seq[Col], nRows: Long,
                              info: String, data: Array[Byte],
                              conf: org.apache.hadoop.conf.Configuration)
      : Unit = {
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val dat = fs.create(new Path(dir, "table.dat"), true)
    dat.write(descriptor(cols, nRows)); dat.close()
    val inf = fs.create(new Path(dir, "table.info"), true)
    inf.write(info.getBytes("ASCII")); inf.close()
    val f0 = fs.create(new Path(dir, "table.f0"), true)
    f0.write(data); f0.close()
  }

  // ---- write -------------------------------------------------------------

  /** Write the container: MAIN + ANTENNA + SPECTRAL_WINDOW +
    * POLARIZATION under `dir` (an `.ms`-style directory). `avg` is the
    * averaged frame, `uvw` the (t, ant) partial-UVW dimension,
    * `antenna` the antenna dimension. Returns MAIN rows written
    * (row-count invariant, as every sink here checks).
    */
  def write(avg: DataFrame, uvw: DataFrame, antenna: DataFrame,
            dir: String, avgTime: Int = 2, avgFreq: Int = 2,
            meta: graft.model.MetaSource = graft.model.SynthDims,
            phaseDir: Option[(Double, Double)] = None): Long = {
    val spark = avg.sparkSession
    // every constant below comes from the metadata seam, not the
    // synthetic Obs defaults — a real container's channel count,
    // frequencies, and timing land in the exported tables
    val nChan = meta.nChans / avgFreq
    val cols = mainCols(nChan)
    val width = rowWidth(cols)
    val sconf = SlabIO.serializableConf(spark)

    val cached = avg.cache()
    val skeleton = MsWriter.msMain(cached, uvw, avgTime,
      meta.intTimeS, meta.gpsStartS)
    val payload = cached.groupBy("t_out", "bl").agg(
      expr("array_sort(collect_list(struct(c_out, a0, a1, a2, a3, " +
        "a4, a5, a6, a7, weight_out, flag_out)))").as("chans"))
    val joined = skeleton.join(payload, Seq("t_out", "bl"))
      .repartitionByRange(32, col("row_idx"))
      .sortWithinPartitions("row_idx")
      .select("row_idx", "time_s", "ant1", "ant2", "u_m", "v_m", "w_m",
        "interval_s", "exposure_s", "flag_row", "data_desc_id",
        "field_id", "scan_number", "chans")

    // per-partition fixed-width slice encode (the uvfits writer's
    // contract: every executed partition emits a part file)
    val rdd = joined.rdd
    val actualParts = rdd.getNumPartitions
    val partCounts: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        val conf = sconf.value
        val partPath = new Path(s"$dir.part$idx")
        val fs = partPath.getFileSystem(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(s"$dir.part$idx.attempt$attempt")
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskFailureListener { (_, _) =>
            fs.delete(tmp, false); ()
          })
        val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 20)
        var written = 0L
        rows.foreach { r: Row =>
          val buf = ByteBuffer.allocate(width)
            .order(ByteOrder.LITTLE_ENDIAN)
          buf.putDouble(r.getDouble(1)) // TIME
          buf.putInt(r.getLong(2).toInt) // ANTENNA1
          buf.putInt(r.getLong(3).toInt) // ANTENNA2
          buf.putDouble(r.getDouble(4)) // UVW
          buf.putDouble(r.getDouble(5))
          buf.putDouble(r.getDouble(6))
          buf.putDouble(r.getDouble(7)) // INTERVAL
          buf.putDouble(r.getDouble(8)) // EXPOSURE
          buf.put(if (r.getBoolean(9)) 1.toByte else 0.toByte)
          buf.putInt(r.getLong(10).toInt) // DATA_DESC_ID
          buf.putInt(r.getLong(11).toInt) // FIELD_ID
          buf.putInt(r.getLong(12).toInt) // SCAN_NUMBER
          // dense chan x pol arrays, absent channels zero-filled
          val data = new Array[Float](nChan * 4 * 2)
          val wspec = new Array[Float](nChan * 4)
          val flg = new Array[Boolean](nChan * 4)
          r.getSeq[Row](13).foreach { ch =>
            val c = ch.getLong(0).toInt
            if (c >= 0 && c < nChan) {
              var p = 0
              while (p < 4) {
                data((c * 4 + p) * 2) = ch.getDouble(1 + 2 * p).toFloat
                data((c * 4 + p) * 2 + 1) =
                  ch.getDouble(2 + 2 * p).toFloat
                wspec(c * 4 + p) = ch.getDouble(9).toFloat
                flg(c * 4 + p) = ch.getBoolean(10)
                p += 1
              }
            }
          }
          data.foreach(buf.putFloat)
          wspec.foreach(buf.putFloat)
          flg.foreach(f => buf.put(if (f) 1.toByte else 0.toByte))
          out.write(buf.array())
          written += 1
        }
        out.close()
        org.apache.hadoop.fs.FileContext.getFileContext(partPath.toUri,
          conf).rename(tmp, partPath,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        Iterator((idx, written))
      }.collect()
    require(partCounts.length == actualParts,
      s"MS container partition invariant: ${partCounts.length} for " +
        s"$actualParts")
    val nRows = partCounts.map(_._2).sum

    // assemble MAIN: descriptor + info driver-side, data = part concat
    val conf = spark.sparkContext.hadoopConfiguration
    val mainDir = new Path(dir)
    val fs = mainDir.getFileSystem(conf)
    fs.mkdirs(mainDir)
    val dat = fs.create(new Path(mainDir, "table.dat"), true)
    dat.write(descriptor(cols, nRows)); dat.close()
    val inf = fs.create(new Path(mainDir, "table.info"), true)
    inf.write("Type = Measurement Set\nSubType = simulated\n"
      .getBytes("ASCII")); inf.close()
    val f0 = new BufferedOutputStream(
      fs.create(new Path(mainDir, "table.f0"), true), 1 << 20)
    (0 until actualParts).foreach { idx =>
      val p = new Path(s"$dir.part$idx")
      require(fs.exists(p), s"missing MS container part $idx")
      val in = fs.open(p)
      IOUtils.copyBytes(in, f0, 1 << 20, false)
      in.close()
      fs.delete(p, false)
    }
    f0.close()

    // subtables: dimension-sized, driver-written
    val ants = antenna
      .select("ant", "east_m", "north_m", "height_m").collect()
      .sortBy(_.getLong(0))
    val antBuf = ByteBuffer
      .allocate(rowWidth(antennaCols) * ants.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    ants.foreach { a =>
      putStr16(antBuf, f"Tile${a.getLong(0)}%03d")
      putStr16(antBuf, "MWA")
      putStr16(antBuf, "ALT-AZ")
      antBuf.putDouble(a.getDouble(1))
      antBuf.putDouble(a.getDouble(2))
      antBuf.putDouble(a.getDouble(3))
      antBuf.putDouble(4.0)
    }
    writeTableFiles(new Path(mainDir, "ANTENNA"), antennaCols,
      ants.length.toLong, "Type = ANTENNA\n", antBuf.array(), conf)

    val widthHz = meta.fineChanWidthHz * avgFreq
    val spwBuf = ByteBuffer.allocate(rowWidth(spwCols(nChan)))
      .order(ByteOrder.LITTLE_ENDIAN)
    spwBuf.putInt(nChan)
    (0 until nChan).foreach(c => spwBuf.putDouble(
      meta.baseFreqHz + (c * avgFreq + (avgFreq - 1) / 2.0)
        * meta.fineChanWidthHz))
    (0 until nChan).foreach(_ => spwBuf.putDouble(widthHz))
    spwBuf.putDouble(widthHz * nChan)
    spwBuf.putDouble(meta.baseFreqHz + (avgFreq - 1) / 2.0
      * meta.fineChanWidthHz)
    writeTableFiles(new Path(mainDir, "SPECTRAL_WINDOW"), spwCols(nChan),
      1L, "Type = SPECTRAL_WINDOW\n", spwBuf.array(), conf)

    val polBuf = ByteBuffer.allocate(rowWidth(polCols))
      .order(ByteOrder.LITTLE_ENDIAN)
    polBuf.putInt(4)
    Seq(9, 10, 11, 12).foreach(polBuf.putInt) // XX XY YX YY Stokes codes
    writeTableFiles(new Path(mainDir, "POLARIZATION"), polCols, 1L,
      "Type = POLARIZATION\n", polBuf.array(), conf)

    val fieldBuf = ByteBuffer.allocate(rowWidth(fieldCols))
      .order(ByteOrder.LITTLE_ENDIAN)
    putStr16(fieldBuf, "GRAFT")
    // PHASE_DIR is a J2000 RA/Dec pair: explicit override first, then
    // the container's phase (or pointing) centre, then the fixed gate
    // ephemeris — NEVER the geometry stage's hour-angle constant (an
    // HA is not an RA; writing it here would hand consumers a
    // meaningless direction)
    val (pRa, pDec) = phaseDir
      .orElse(meta.phaseCentreDeg.map { case (r, d) =>
        (r.toRadians, d.toRadians) })
      .getOrElse((graft.ops.GeometryCorrection.AppRaJ2000,
        graft.ops.GeometryCorrection.AppDecJ2000))
    fieldBuf.putDouble(pRa)
    fieldBuf.putDouble(pDec)
    writeTableFiles(new Path(mainDir, "FIELD"), fieldCols, 1L,
      "Type = FIELD\n", fieldBuf.array(), conf)

    val obsBuf = ByteBuffer.allocate(rowWidth(observationCols))
      .order(ByteOrder.LITTLE_ENDIAN)
    putStr16(obsBuf, "MWA")
    putStr16(obsBuf, "graft")
    val t0 = MsWriter.MjdEpochOffsetS + meta.gpsStartS
    obsBuf.putDouble(t0)
    obsBuf.putDouble(t0 + meta.nScans * meta.intTimeS)
    writeTableFiles(new Path(mainDir, "OBSERVATION"), observationCols,
      1L, "Type = OBSERVATION\n", obsBuf.array(), conf)

    cached.unpersist()
    nRows
  }

  // ---- read-back ---------------------------------------------------------

  /** One decoded cell: the column's values as doubles (bools 0/1,
    * strings excluded — use [[readStrings]]).
    */
  def readTable(dir: String,
                conf: org.apache.hadoop.conf.Configuration)
      : (Seq[Col], Long, ByteBuffer) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    def slurp(name: String): Array[Byte] = {
      val st = fs.getFileStatus(new Path(d, name))
      // the in-memory decode addresses cells through one ByteBuffer;
      // past 2 GiB the Int casts below would silently truncate and
      // return garbage — fail loudly instead (larger tables need the
      // positioned-read path the uvfits reader uses)
      require(st.getLen <= Int.MaxValue,
        s"MS container $dir/$name is ${st.getLen} B — in-memory " +
          "read-back handles < 2 GiB")
      val in = fs.open(new Path(d, name))
      val out = new Array[Byte](st.getLen.toInt)
      in.readFully(0, out)
      in.close()
      out
    }
    val (cols, nRows) = parseDescriptor(slurp("table.dat"))
    val data = ByteBuffer.wrap(slurp("table.f0"))
      .order(ByteOrder.LITTLE_ENDIAN)
    require(data.capacity() == rowWidth(cols) * nRows,
      s"MS container $dir: data size ${data.capacity()} != " +
        s"${rowWidth(cols)} x $nRows")
    (cols, nRows, data)
  }

  /** Offset of a named column inside a row. */
  def colOffset(cols: Seq[Col], name: String): Int = {
    val i = cols.indexWhere(_.name == name)
    require(i >= 0, s"no column $name")
    cols.take(i).map(c => cellWidth(c.typeCode) * c.elems).sum
  }

  /** Scalar/array numeric cell of row `r` (bools as 0/1; complex64
    * cells yield re,im interleaved — 2·elems doubles).
    */
  def cell(cols: Seq[Col], data: ByteBuffer, r: Long,
           name: String): Seq[Double] = {
    val c = cols.find(_.name == name).get
    // safe Int cast: slurp() guarantees the buffer (= rowWidth·nRows)
    // is < 2 GiB, so r·rowWidth for any in-range row fits an Int
    val base = (r * rowWidth(cols)).toInt + colOffset(cols, name)
    if (c.typeCode == 6)
      (0 until c.elems * 2).map(k => data.getFloat(base + k * 4).toDouble)
    else (0 until c.elems).map { k =>
      val off = base + k * cellWidth(c.typeCode)
      c.typeCode match {
        case 1 => data.getInt(off).toDouble
        case 2 => data.getLong(off).toDouble
        case 3 => data.getFloat(off).toDouble
        case 4 => data.getDouble(off)
        case 5 => (data.get(off) & 0xff).toDouble
        case t => sys.error(s"cell(): non-numeric type $t")
      }
    }
  }

  /** Fixed-16 string cell. */
  def strCell(cols: Seq[Col], data: ByteBuffer, r: Long,
              name: String): String = {
    val base = (r * rowWidth(cols)).toInt + colOffset(cols, name)
    val b = new Array[Byte](16)
    var i = 0
    while (i < 16) { b(i) = data.get(base + i); i += 1 }
    new String(b, "ASCII").trim
  }
}
