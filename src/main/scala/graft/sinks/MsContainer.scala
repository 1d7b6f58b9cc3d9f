package graft.sinks

import java.io.{BufferedOutputStream, ByteArrayOutputStream, DataOutputStream}

import graft.sinks.CasaTables._
import graft.sources.SlabIO
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K2 (container form): a Measurement-Set directory export in the
  * casacore table structure — one directory per table holding
  * `table.info`, a `table.dat` descriptor (AipsIO object stream:
  * Table → TableDesc → ColumnDesc* → ColumnSet), and a `table.f0`
  * StManAipsIO storage-manager data file, with MAIN (full MS v2
  * required column set) plus EVERY MS v2 required subtable
  * ([[subtableNames]]) linked from MAIN's keywordSet as TpTable
  * fields — the path casacore's MeasurementSet resolves subtables
  * through — fed from the same frames as the parquet mirror
  * ([[MsWriter]]; reference `write_ms`,
  * /root/reference/src/io/mod.rs:542-595, table init :575-586, a
  * rubbl-vendored casacore).
  *
  * Byte format: see [[CasaTables]] — the AipsIO object protocol
  * (0xbebebebe magics, canonical big-endian, length-framed nesting)
  * and the StManAipsIO column-major extension layout are casacore's;
  * the field sequences inside the descriptor objects are reconstructed
  * from the public casacore writers and NOT validated against a
  * casacore build (none available here) — the honest deviation is
  * documented in the README "Format notes", and the parquet mirror
  * remains the guaranteed-interoperable export.
  *
  * Scale shape: MAIN is encoded ON THE EXECUTORS — the frame arrives
  * with the range-partitioned global `row_idx` ([[Sinks.orderedRowIdx]]);
  * each partition encodes its rows COLUMN-MAJOR (casacore's storage
  * order) into one part file, each column chunk a self-delimiting
  * StManAipsIO extension `[uInt nrows][values]`, and the driver
  * assembles `table.f0` by streaming the chunks per column with
  * precomputed object lengths — no row buffering, no second pass over
  * the data. Subtables are dimension-sized and driver-written. The
  * single-file tail is the same documented object-store contract as
  * the uvfits assembly. Row counts are uInt (Table v2): a MAIN table
  * past 2^32 rows fails loudly rather than wrapping.
  */
object MsContainer {

  /** Decoded table: columns, row count, numeric cells (per row,
    * flattened cell elems; complex as re,im interleaved; bools 0/1)
    * and string cells.
    */
  final case class Decoded(cols: Seq[CasaCol], nRows: Long,
                           num: Map[String, IndexedSeq[Seq[Double]]],
                           strs: Map[String, IndexedSeq[String]])

  // ---- column sets (standard MeasurementSet v2 names) --------------------

  /** MS2 MAIN columns — the full required set of the MeasurementSet
    * v2 definition. Array cells are casacore column-major: first axis
    * (polarization) varies fastest — shape (4, nChan). Row-level
    * WEIGHT(p) is the sum over channels of WEIGHT_SPECTRUM(p,·);
    * SIGMA(p) = 1/√WEIGHT(p) (−1 where the weight is non-positive) —
    * the documented convention of this writer. STATE_ID is −1
    * (no STATE rows), the casacore convention for an empty STATE
    * table; FEED1/FEED2/ARRAY_ID/OBSERVATION_ID/PROCESSOR_ID are the
    * single-configuration zeros; TIME_CENTROID equals TIME (no
    * within-interval blanking model).
    */
  def mainCols(nChan: Int): Seq[CasaCol] = Seq(
    CasaCol("TIME", TpDouble, Nil),
    CasaCol("ANTENNA1", TpInt, Nil), CasaCol("ANTENNA2", TpInt, Nil),
    CasaCol("UVW", TpDouble, Seq(3)),
    CasaCol("INTERVAL", TpDouble, Nil),
    CasaCol("EXPOSURE", TpDouble, Nil),
    CasaCol("FLAG_ROW", TpBool, Nil),
    CasaCol("DATA_DESC_ID", TpInt, Nil),
    CasaCol("FIELD_ID", TpInt, Nil),
    CasaCol("SCAN_NUMBER", TpInt, Nil),
    CasaCol("DATA", TpComplex, Seq(4, nChan)),
    CasaCol("WEIGHT_SPECTRUM", TpFloat, Seq(4, nChan)),
    CasaCol("FLAG", TpBool, Seq(4, nChan)),
    CasaCol("FEED1", TpInt, Nil), CasaCol("FEED2", TpInt, Nil),
    CasaCol("ARRAY_ID", TpInt, Nil),
    CasaCol("OBSERVATION_ID", TpInt, Nil),
    CasaCol("PROCESSOR_ID", TpInt, Nil),
    CasaCol("STATE_ID", TpInt, Nil),
    CasaCol("TIME_CENTROID", TpDouble, Nil),
    CasaCol("WEIGHT", TpFloat, Seq(4)),
    CasaCol("SIGMA", TpFloat, Seq(4)))

  val antennaCols: Seq[CasaCol] = Seq(
    CasaCol("NAME", TpString, Nil), CasaCol("STATION", TpString, Nil),
    CasaCol("MOUNT", TpString, Nil),
    CasaCol("POSITION", TpDouble, Seq(3)),
    CasaCol("DISH_DIAMETER", TpDouble, Nil))

  def spwCols(nChan: Int): Seq[CasaCol] = Seq(
    CasaCol("NUM_CHAN", TpInt, Nil),
    CasaCol("CHAN_FREQ", TpDouble, Seq(nChan)),
    CasaCol("CHAN_WIDTH", TpDouble, Seq(nChan)),
    CasaCol("TOTAL_BANDWIDTH", TpDouble, Nil),
    CasaCol("REF_FREQUENCY", TpDouble, Nil))

  val polCols: Seq[CasaCol] = Seq(
    CasaCol("NUM_CORR", TpInt, Nil),
    CasaCol("CORR_TYPE", TpInt, Seq(4)))

  val fieldCols: Seq[CasaCol] = Seq(
    CasaCol("NAME", TpString, Nil),
    CasaCol("PHASE_DIR", TpDouble, Seq(2)))

  val observationCols: Seq[CasaCol] = Seq(
    CasaCol("TELESCOPE_NAME", TpString, Nil),
    CasaCol("OBSERVER", TpString, Nil),
    CasaCol("TIME_RANGE", TpDouble, Seq(2)))

  /** DATA_DESCRIPTION: the (SPW, POLARIZATION) pairing MAIN's
    * DATA_DESC_ID indexes — one row here (single configuration).
    */
  val dataDescCols: Seq[CasaCol] = Seq(
    CasaCol("SPECTRAL_WINDOW_ID", TpInt, Nil),
    CasaCol("POLARIZATION_ID", TpInt, Nil),
    CasaCol("FLAG_ROW", TpBool, Nil))

  /** FEED: one row per antenna — dual linear receptors (X, Y),
    * receptor angle 0, valid for the whole observation
    * (SPECTRAL_WINDOW_ID −1 = all windows).
    */
  val feedCols: Seq[CasaCol] = Seq(
    CasaCol("ANTENNA_ID", TpInt, Nil),
    CasaCol("FEED_ID", TpInt, Nil),
    CasaCol("SPECTRAL_WINDOW_ID", TpInt, Nil),
    CasaCol("TIME", TpDouble, Nil),
    CasaCol("INTERVAL", TpDouble, Nil),
    CasaCol("NUM_RECEPTORS", TpInt, Nil),
    CasaCol("BEAM_ID", TpInt, Nil),
    CasaCol("POLARIZATION_TYPE", TpString, Seq(2)),
    CasaCol("RECEPTOR_ANGLE", TpDouble, Seq(2)))

  // the remaining MS2 required subtables, written with zero rows —
  // present so the required-set contract holds (a reader iterating
  // the standard subtables finds every one), empty because the engine
  // tracks no flag commands / history / pointing models / processors /
  // states for this export
  val flagCmdCols: Seq[CasaCol] = Seq(
    CasaCol("TIME", TpDouble, Nil), CasaCol("INTERVAL", TpDouble, Nil),
    CasaCol("TYPE", TpString, Nil), CasaCol("REASON", TpString, Nil),
    CasaCol("LEVEL", TpInt, Nil), CasaCol("SEVERITY", TpInt, Nil),
    CasaCol("APPLIED", TpBool, Nil), CasaCol("COMMAND", TpString, Nil))

  val historyCols: Seq[CasaCol] = Seq(
    CasaCol("TIME", TpDouble, Nil),
    CasaCol("OBSERVATION_ID", TpInt, Nil),
    CasaCol("MESSAGE", TpString, Nil),
    CasaCol("PRIORITY", TpString, Nil),
    CasaCol("ORIGIN", TpString, Nil),
    CasaCol("APPLICATION", TpString, Nil))

  val pointingCols: Seq[CasaCol] = Seq(
    CasaCol("ANTENNA_ID", TpInt, Nil), CasaCol("TIME", TpDouble, Nil),
    CasaCol("INTERVAL", TpDouble, Nil), CasaCol("NAME", TpString, Nil),
    CasaCol("NUM_POLY", TpInt, Nil),
    CasaCol("TIME_ORIGIN", TpDouble, Nil),
    CasaCol("DIRECTION", TpDouble, Seq(2)),
    CasaCol("TARGET", TpDouble, Seq(2)),
    CasaCol("TRACKING", TpBool, Nil))

  val processorCols: Seq[CasaCol] = Seq(
    CasaCol("TYPE", TpString, Nil), CasaCol("SUB_TYPE", TpString, Nil),
    CasaCol("TYPE_ID", TpInt, Nil), CasaCol("MODE_ID", TpInt, Nil),
    CasaCol("FLAG_ROW", TpBool, Nil))

  val stateCols: Seq[CasaCol] = Seq(
    CasaCol("SIG", TpBool, Nil), CasaCol("REF", TpBool, Nil),
    CasaCol("CAL", TpDouble, Nil), CasaCol("LOAD", TpDouble, Nil),
    CasaCol("SUB_SCAN", TpInt, Nil), CasaCol("OBS_MODE", TpString, Nil),
    CasaCol("FLAG_ROW", TpBool, Nil))

  /** The MS2 required subtable names, in the order this writer emits
    * them — the set MAIN's keywordSet links and CASA-class readers
    * iterate.
    */
  val subtableNames: Seq[String] = Seq("ANTENNA", "DATA_DESCRIPTION",
    "FEED", "FIELD", "FLAG_CMD", "HISTORY", "OBSERVATION", "POINTING",
    "POLARIZATION", "PROCESSOR", "SPECTRAL_WINDOW", "STATE")

  // ---- driver-side small-table write -------------------------------------

  private def writeTable(dir: Path, descName: String, cols: Seq[CasaCol],
                         nRows: Long, info: String,
                         num: Map[String, Seq[Seq[Double]]],
                         strs: Map[String, Seq[String]],
                         conf: org.apache.hadoop.conf.Configuration)
      : Unit = {
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val dat = fs.create(new Path(dir, "table.dat"), true)
    dat.write(tableDat(descName, nRows, cols)); dat.close()
    val inf = fs.create(new Path(dir, "table.info"), true)
    inf.write(info.getBytes("ASCII")); inf.close()
    val f0 = fs.create(new Path(dir, "table.f0"), true)
    f0.write(stManF0(nRows, cols, num, strs)); f0.close()
  }

  /** casacore TableInfo text file ("Type = ..." / "SubType = ..."
    * lines, then readme text).
    */
  private def infoText(tpe: String, sub: String = ""): String =
    s"Type = $tpe\nSubType = $sub\n\n"

  // ---- streaming AipsIO framing for the MAIN data file -------------------

  /** Write one AipsIO object header with a precomputed total length
    * (the streaming twin of [[CasaTables.Out.putstart]]).
    */
  private def frame(out: DataOutputStream, totalLen: Long, tpe: String,
                    version: Int): Unit = {
    out.writeInt(totalLen.toInt)
    out.writeInt(Magic.toInt)
    val b = tpe.getBytes("ASCII")
    out.writeInt(b.length); out.write(b)
    out.writeInt(version)
  }

  // ---- write -------------------------------------------------------------

  /** Cost attribution of the LAST [[write]] on this driver — the
    * benchmark's q_k2b entry records it so the one gate that pays a
    * full container write per timed run carries WHERE the seconds go:
    *  - `encodeCpuSec`: summed executor CPU inside the column-major
    *    row encode + bool bit-packing (can exceed wall — parallel)
    *  - `partWriteCpuSec`: summed executor CPU writing/renaming the
    *    per-partition part files
    *  - `mainJobSec`: wall time of the distributed MAIN job (compute +
    *    encode + part writes, the `collect()` span)
    *  - `assembleSec`: wall time of the driver-side container
    *    assembly (table.dat, table.f0 streaming from parts, subtables)
    */
  final case class WriteStats(encodeCpuSec: Double,
                              partWriteCpuSec: Double,
                              mainJobSec: Double, assembleSec: Double)
  @volatile private var lastStats: Option[WriteStats] = None
  def lastWriteStats: Option[WriteStats] = lastStats

  /** Write the container under `dir` (an `.ms`-style directory).
    * `avg` is the averaged frame, `uvw` the (t, ant) partial-UVW
    * dimension, `antenna` the antenna dimension. Returns MAIN rows
    * written (row-count invariant, as every sink here checks).
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
    val sconf = SlabIO.serializableConf(spark)

    val cached = avg.cache()
    val skeleton = MsWriter.msMain(cached, uvw, avgTime,
      meta.intTimeS, meta.gpsStartS)
    val payload = cached.groupBy("t_out", "bl").agg(
      expr("array_sort(collect_list(struct(c_out, a0, a1, a2, a3, " +
        "a4, a5, a6, a7, weight_out, flag_out)))").as("chans"))
    // size-derived encode parallelism: drive the part-file count from
    // the cached cell count (rows / nChan ~= MS main rows); a fixed
    // count caps part_write_cpu, the dominant sink cost, at scale
    val encParts = Sinks.encodePartitions(spark,
      math.max(1L, cached.count() / math.max(1, nChan)))
    val joined = skeleton.join(payload, Seq("t_out", "bl"))
      .repartitionByRange(encParts, col("row_idx"))
      .sortWithinPartitions("row_idx")
      .select("row_idx", "time_s", "ant1", "ant2", "u_m", "v_m", "w_m",
        "interval_s", "exposure_s", "flag_row", "data_desc_id",
        "field_id", "scan_number", "chans")

    // per-partition COLUMN-MAJOR encode: each partition emits one part
    // file = [int ncol][long chunkBytes × ncol][chunk × ncol], every
    // chunk a self-contained StManAipsIO extension [uInt n][values]
    val ncol = cols.length
    val rdd = joined.rdd
    val actualParts = rdd.getNumPartitions
    val encodeAcc = spark.sparkContext.doubleAccumulator("msEncodeSec")
    val partWriteAcc =
      spark.sparkContext.doubleAccumulator("msPartWriteSec")
    val jobT0 = System.nanoTime()
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
        // one growing buffer per non-bool column; bools collect flat
        // and bit-pack once the partition's row count is known
        val bufs = Array.fill(ncol)(new ByteArrayOutputStream(1 << 16))
        val outs = bufs.map(b => new DataOutputStream(b))
        val flagRow = scala.collection.mutable.ArrayBuffer[Boolean]()
        val flags = scala.collection.mutable.ArrayBuffer[Boolean]()
        var written = 0L
        // per-row nanoTime brackets isolate the ENCODE body from the
        // upstream compute the lazy iterator interleaves into foreach
        var encNanos = 0L
        rows.foreach { r: Row =>
          val encT0 = System.nanoTime()
          outs(0).writeDouble(r.getDouble(1)) // TIME
          outs(1).writeInt(r.getLong(2).toInt) // ANTENNA1
          outs(2).writeInt(r.getLong(3).toInt) // ANTENNA2
          outs(3).writeDouble(r.getDouble(4)) // UVW
          outs(3).writeDouble(r.getDouble(5))
          outs(3).writeDouble(r.getDouble(6))
          outs(4).writeDouble(r.getDouble(7)) // INTERVAL
          outs(5).writeDouble(r.getDouble(8)) // EXPOSURE
          flagRow += r.getBoolean(9) // FLAG_ROW
          outs(7).writeInt(r.getLong(10).toInt) // DATA_DESC_ID
          outs(8).writeInt(r.getLong(11).toInt) // FIELD_ID
          outs(9).writeInt(r.getLong(12).toInt) // SCAN_NUMBER
          // dense pol-fastest chan arrays, absent channels zero-filled
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
          data.foreach(outs(10).writeFloat) // DATA
          wspec.foreach(outs(11).writeFloat) // WEIGHT_SPECTRUM
          flags ++= flg // FLAG
          outs(13).writeInt(0) // FEED1
          outs(14).writeInt(0) // FEED2
          outs(15).writeInt(0) // ARRAY_ID
          outs(16).writeInt(0) // OBSERVATION_ID
          outs(17).writeInt(0) // PROCESSOR_ID
          outs(18).writeInt(-1) // STATE_ID (empty STATE table)
          outs(19).writeDouble(r.getDouble(1)) // TIME_CENTROID = TIME
          // row-level WEIGHT(p) = Σ_c WEIGHT_SPECTRUM(p,c);
          // SIGMA(p) = 1/√WEIGHT(p), −1 where non-positive
          var p = 0
          while (p < 4) {
            var w = 0.0f
            var c = 0
            while (c < nChan) { w += wspec(c * 4 + p); c += 1 }
            outs(20).writeFloat(w) // WEIGHT
            outs(21).writeFloat( // SIGMA
              if (w > 0.0f) (1.0 / math.sqrt(w.toDouble)).toFloat
              else -1.0f)
            p += 1
          }
          written += 1
          encNanos += System.nanoTime() - encT0
        }
        require(written <= Int.MaxValue, "partition rows exceed uInt")
        val packT0 = System.nanoTime()
        outs(6).write(packBools(flagRow.toArray))
        outs(12).write(packBools(flags.toArray))
        outs.foreach(_.flush())
        encNanos += System.nanoTime() - packT0
        encodeAcc.add(encNanos / 1e9)
        val wrT0 = System.nanoTime()
        val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 20)
        val dos = new DataOutputStream(out)
        dos.writeInt(ncol)
        (0 until ncol).foreach(c => dos.writeLong(4L + bufs(c).size()))
        (0 until ncol).foreach { c =>
          dos.writeInt(written.toInt) // extension row count
          bufs(c).writeTo(dos)
        }
        dos.close()
        org.apache.hadoop.fs.FileContext.getFileContext(partPath.toUri,
          conf).rename(tmp, partPath,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        partWriteAcc.add((System.nanoTime() - wrT0) / 1e9)
        Iterator((idx, written))
      }.collect()
    val mainJobSec = (System.nanoTime() - jobT0) / 1e9
    require(partCounts.length == actualParts,
      s"MS container partition invariant: ${partCounts.length} for " +
        s"$actualParts")
    val assembleT0 = System.nanoTime()
    val nRows = partCounts.map(_._2).sum
    require(nRows <= 0xffffffffL,
      s"MAIN rows $nRows exceed the Table-v2 uInt row count")

    // assemble MAIN: descriptor + info driver-side; table.f0 streamed
    // per column from the part chunks with precomputed object lengths
    val conf = spark.sparkContext.hadoopConfiguration
    val mainDir = new Path(dir)
    val fs = mainDir.getFileSystem(conf)
    fs.mkdirs(mainDir)
    // MAIN keywordSet: MS_VERSION plus one Table link per required
    // subtable — the links are how casacore's MeasurementSet resolves
    // ANTENNA/SPECTRAL_WINDOW/… from the opened MAIN table
    val dat = fs.create(new Path(mainDir, "table.dat"), true)
    dat.write(tableDat("MAIN", nRows, cols,
      ("MS_VERSION" -> (CasaTables.RecFloat(2.0f): CasaTables.RecVal)) +:
        subtableNames.map(n => n -> (CasaTables.RecTable(n): CasaTables.RecVal))))
    dat.close()
    val inf = fs.create(new Path(mainDir, "table.info"), true)
    inf.write(infoText("Measurement Set").getBytes("ASCII"))
    inf.close()

    // part headers: chunk lengths per column + chunk offsets
    val partMeta: Seq[(Path, Array[Long], Array[Long])] =
      (0 until actualParts).map { idx =>
        val p = new Path(s"$dir.part$idx")
        require(fs.exists(p), s"missing MS container part $idx")
        val in = fs.open(p)
        val nc = in.readInt()
        require(nc == ncol, s"part $idx has $nc columns, expected $ncol")
        val lens = Array.fill(ncol)(in.readLong())
        in.close()
        val offs = new Array[Long](ncol)
        var off = 4L + 8L * ncol
        (0 until ncol).foreach { c => offs(c) = off; off += lens(c) }
        (p, lens, offs)
      }
    val colChunkBytes: Array[Long] =
      (0 until ncol).map(c => partMeta.map(_._2(c)).sum).toArray
    val colObjLen: Array[Long] = colChunkBytes.map(b =>
      frameBytes("StManColumnAipsIO") + 4L + b)
    val smLen = frameBytes("StManAipsIO") + 12L + colObjLen.sum

    val f0 = new DataOutputStream(new BufferedOutputStream(
      fs.create(new Path(mainDir, "table.f0"), true), 1 << 20))
    frame(f0, smLen, "StManAipsIO", 2)
    f0.writeInt(0) // uniqnr
    f0.writeInt(nRows.toInt)
    f0.writeInt(ncol)
    (0 until ncol).foreach { c =>
      frame(f0, colObjLen(c), "StManColumnAipsIO", 2)
      f0.writeInt(nRows.toInt)
      partMeta.foreach { case (p, lens, offs) =>
        val in = fs.open(p)
        in.seek(offs(c))
        val buf = new Array[Byte](1 << 20)
        var left = lens(c)
        while (left > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, left).toInt)
          require(n > 0, s"short read in part $p col $c")
          f0.write(buf, 0, n)
          left -= n
        }
        in.close()
      }
    }
    f0.close()
    (0 until actualParts).foreach(idx =>
      fs.delete(new Path(s"$dir.part$idx"), false))

    // subtables: dimension-sized, driver-written
    val ants = antenna
      .select("ant", "east_m", "north_m", "height_m").collect()
      .sortBy(_.getLong(0))
    writeTable(new Path(mainDir, "ANTENNA"), "ANTENNA", antennaCols,
      ants.length.toLong, infoText("ANTENNA"),
      Map(
        "POSITION" -> ants.map(a => Seq(a.getDouble(1), a.getDouble(2),
          a.getDouble(3))).toSeq,
        "DISH_DIAMETER" -> ants.map(_ => Seq(4.0)).toSeq),
      Map(
        "NAME" -> ants.map(a => f"Tile${a.getLong(0)}%03d").toSeq,
        "STATION" -> ants.map(_ => "MWA").toSeq,
        "MOUNT" -> ants.map(_ => "ALT-AZ").toSeq),
      conf)

    val widthHz = meta.fineChanWidthHz * avgFreq
    writeTable(new Path(mainDir, "SPECTRAL_WINDOW"), "SPECTRAL_WINDOW",
      spwCols(nChan), 1L, infoText("SPECTRAL_WINDOW"),
      Map(
        "NUM_CHAN" -> Seq(Seq(nChan.toDouble)),
        "CHAN_FREQ" -> Seq((0 until nChan).map(c =>
          meta.baseFreqHz + (c * avgFreq + (avgFreq - 1) / 2.0)
            * meta.fineChanWidthHz)),
        "CHAN_WIDTH" -> Seq(Seq.fill(nChan)(widthHz)),
        "TOTAL_BANDWIDTH" -> Seq(Seq(widthHz * nChan)),
        "REF_FREQUENCY" -> Seq(Seq(meta.baseFreqHz + (avgFreq - 1) / 2.0
          * meta.fineChanWidthHz))),
      Map.empty, conf)

    writeTable(new Path(mainDir, "POLARIZATION"), "POLARIZATION",
      polCols, 1L, infoText("POLARIZATION"),
      Map(
        "NUM_CORR" -> Seq(Seq(4.0)),
        // XX XY YX YY Stokes codes
        "CORR_TYPE" -> Seq(Seq(9.0, 10.0, 11.0, 12.0))),
      Map.empty, conf)

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
    writeTable(new Path(mainDir, "FIELD"), "FIELD", fieldCols, 1L,
      infoText("FIELD"),
      Map("PHASE_DIR" -> Seq(Seq(pRa, pDec))),
      Map("NAME" -> Seq("GRAFT")), conf)

    val t0 = MsWriter.MjdEpochOffsetS + meta.gpsStartS
    val durS = meta.nScans * meta.intTimeS
    writeTable(new Path(mainDir, "OBSERVATION"), "OBSERVATION",
      observationCols, 1L, infoText("OBSERVATION"),
      Map("TIME_RANGE" -> Seq(Seq(t0, t0 + durS))),
      Map(
        "TELESCOPE_NAME" -> Seq("MWA"),
        "OBSERVER" -> Seq("graft")), conf)

    // DATA_DESCRIPTION: the one (SPW 0, POL 0) configuration every
    // MAIN row's DATA_DESC_ID = 0 indexes
    writeTable(new Path(mainDir, "DATA_DESCRIPTION"),
      "DATA_DESCRIPTION", dataDescCols, 1L,
      infoText("DATA_DESCRIPTION"),
      Map(
        "SPECTRAL_WINDOW_ID" -> Seq(Seq(0.0)),
        "POLARIZATION_ID" -> Seq(Seq(0.0)),
        "FLAG_ROW" -> Seq(Seq(0.0))),
      Map.empty, conf)

    // FEED: dual-linear (X, Y) receptors per antenna, valid for the
    // whole observation
    val nA = ants.length
    writeTable(new Path(mainDir, "FEED"), "FEED", feedCols, nA.toLong,
      infoText("FEED"),
      Map(
        "ANTENNA_ID" -> ants.map(a => Seq(a.getLong(0).toDouble)).toSeq,
        "FEED_ID" -> Seq.fill(nA)(Seq(0.0)),
        "SPECTRAL_WINDOW_ID" -> Seq.fill(nA)(Seq(-1.0)),
        "TIME" -> Seq.fill(nA)(Seq(t0 + durS / 2.0)),
        "INTERVAL" -> Seq.fill(nA)(Seq(durS)),
        "NUM_RECEPTORS" -> Seq.fill(nA)(Seq(2.0)),
        "BEAM_ID" -> Seq.fill(nA)(Seq(-1.0)),
        "RECEPTOR_ANGLE" -> Seq.fill(nA)(Seq(0.0, 0.0))),
      Map("POLARIZATION_TYPE" ->
        Seq.fill(nA)(Seq("X", "Y")).flatten), conf)

    // the remaining required subtables, zero rows (see column-set doc)
    Seq(
      ("FLAG_CMD", flagCmdCols), ("HISTORY", historyCols),
      ("POINTING", pointingCols), ("PROCESSOR", processorCols),
      ("STATE", stateCols)).foreach { case (name, tcols) =>
      writeTable(new Path(mainDir, name), name, tcols, 0L,
        infoText(name), Map.empty, Map.empty, conf)
    }

    cached.unpersist()
    lastStats = Some(WriteStats(encodeAcc.value, partWriteAcc.value,
      mainJobSec, (System.nanoTime() - assembleT0) / 1e9))
    nRows
  }

  // ---- read-back ---------------------------------------------------------

  private def slurp(fs: org.apache.hadoop.fs.FileSystem, p: Path)
      : Array[Byte] = {
    val st = fs.getFileStatus(p)
    // the in-memory decode addresses cells through one buffer; past
    // 2 GiB the Int offsets would truncate — fail loudly instead
    // (larger tables need a positioned-read path)
    require(st.getLen <= Int.MaxValue,
      s"MS table file $p is ${st.getLen} B — in-memory read-back " +
        "handles < 2 GiB")
    val in = fs.open(p)
    val out = new Array[Byte](st.getLen.toInt)
    in.readFully(0, out)
    in.close()
    out
  }

  /** Decode one table directory through the independent
    * [[CasaTables]] reader (descriptor chain + StManAipsIO data).
    * `maxRows` is checked against `table.dat`'s row count BEFORE the
    * data file is slurped — a fixture-scale gate pointed at a
    * production MAIN fails loudly without ever loading it into driver
    * memory (same bound discipline as [[replay]]).
    */
  def readTable(dir: String,
                conf: org.apache.hadoop.conf.Configuration,
                maxRows: Long = Long.MaxValue): Decoded = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val (nRows, cols) = readTableDat(slurp(fs, new Path(d, "table.dat")))
    require(nRows <= maxRows,
      s"readTable($dir): $nRows rows exceeds the caller's bound " +
        s"$maxRows — the f0 decode is driver-side by design")
    val (num, strs) = readF0(slurp(fs, new Path(d, "table.f0")), nRows,
      cols)
    Decoded(cols, nRows, num, strs)
  }

  /** The keyword record of one table directory's `table.dat` —
    * MS_VERSION and the subtable links on MAIN.
    */
  def readKeywords(dir: String,
                   conf: org.apache.hadoop.conf.Configuration)
      : Seq[(String, CasaTables.RecVal)] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    CasaTables.readTableDatKw(slurp(fs, new Path(d, "table.dat")))._3
  }

  /** Structural audit of one table directory: AipsIO object walk of
    * both files (every header's magic verified), returning
    * (nRows, nCols, datObjects, f0Objects).
    */
  def audit(dir: String,
            conf: org.apache.hadoop.conf.Configuration)
      : (Long, Int, Int, Int) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val dat = slurp(fs, new Path(d, "table.dat"))
    val (nRows, cols) = readTableDat(dat)
    val datObjs = CasaTables.walk(dat)
    val f0Objs = CasaTables.walk(slurp(fs, new Path(d, "table.f0")))
    require(f0Objs.count(_.tpe == "StManColumnAipsIO") == cols.length,
      s"$dir table.f0: expected ${cols.length} column objects")
    (nRows, cols.length, datObjs.length, f0Objs.length)
  }

  /** Strict reader-replay of one table directory (the q_k2g ratchet):
    * `table.dat` then `table.f0` read field-by-field in casacore's
    * open order with exact per-object consumption — see
    * [[CasaTables.replayTableDat]] / [[CasaTables.replayF0]]. Returns
    * (nRows, columns in descriptor order, dat objects, f0 objects).
    */
  def replay(dir: String,
             conf: org.apache.hadoop.conf.Configuration,
             maxRows: Long = Long.MaxValue)
      : (Long, Seq[CasaCol], Seq[CasaTables.ReplayObj],
         Seq[CasaTables.ReplayObj]) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val (nRows, cols, _, datObjs) =
      CasaTables.replayTableDat(slurp(fs, new Path(d, "table.dat")))
    // the descriptor replay above reads KBs; the data-file replay
    // below slurps table.f0 whole — callers that are fixture-scale
    // gates pass a bound so accidental large-sf use fails loudly
    // instead of loading a production MAIN into driver memory
    require(nRows <= maxRows,
      s"replay($dir): $nRows rows exceeds the caller's bound $maxRows" +
        " — the f0 replay is driver-side by design")
    val f0Objs = CasaTables.replayF0(
      slurp(fs, new Path(d, "table.f0")), nRows, cols)
    (nRows, cols, datObjs, f0Objs)
  }

  /** Numeric cell of row `r` (bools as 0/1; complex cells yield re,im
    * interleaved — 2·elems doubles).
    */
  def cell(dec: Decoded, r: Long, name: String): Seq[Double] =
    dec.num(name)(r.toInt)

  /** String cell. */
  def strCell(dec: Decoded, r: Long, name: String): String =
    dec.strs(name)(r.toInt)
}
