package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 (real container): metafits ingest — observation metadata from the
  * MWA's public metafits FITS layout, replacing the synthetic
  * [[graft.model.Dims]] constants with parsed values.
  *
  * The reference opens the metafits via mwalib
  * (/root/reference/src/io/mod.rs:54-65) and consumes, per RF input:
  * electrical lengths for the cable correction
  * (/root/reference/src/corrections.rs:118-127), per-coarse-channel
  * digital gains normalised by 64 (corrections.rs:356-365), the
  * per-input flag bit (flags.rs:121-126), and the quack duration that
  * seeds flag_init (flags.rs:133). The public container is:
  *
  *  - a primary HDU whose keywords carry the observation constants
  *    (GPSTIME, INTTIME s, FINECHAN kHz, NCHANS, NSCANS, QUACKTIM s,
  *    CHANNELS — the comma-separated coarse-channel list, FREQCENT MHz);
  *  - one `TILEDATA` binary-table extension with TWO rows per tile (X
  *    then Y RF input): Input/Antenna/Tile J, TileName A, Pol A,
  *    Length A (`EL_<metres>` = pre-measured electrical length),
  *    North/East/Height E, Flag J, Gains nJ (raw, /64 to apply),
  *    Rx/Slot J.
  *
  * Header walking reuses [[FitsGpubox.scanHdus]] — the same 2880-byte
  * card machinery that decodes gpubox files; only the BINTABLE row
  * codec is new. Everything lands in the [[graft.model.Dims]] column
  * layout, so every correction operator runs unchanged on parsed
  * metadata: the tables stay broadcast-sized (2·n_ants rows), exactly
  * the access pattern the synthetic dims established.
  */
object MetafitsReader {

  /** One RF input row of TILEDATA (half a tile: one polarisation). */
  final case class RfInput(input: Int, ant: Int, tileName: String,
                           pol: String, flagged: Boolean,
                           elecLenM: Double, eastM: Double,
                           northM: Double, heightM: Double,
                           gains: Vector[Int], rx: Int, slot: Int)

  /** Parsed metafits: primary keywords + TILEDATA rows. */
  final case class Metafits(keywords: Map[String, String],
                            inputs: Vector[RfInput]) {
    private def kw(k: String): String = keywords.getOrElse(k,
      sys.error(s"metafits keyword $k missing"))

    def obsId: Long = kw("GPSTIME").toLong
    def intTimeS: Double = kw("INTTIME").toDouble
    /** FINECHAN is kHz in the container. */
    def fineChanWidthHz: Double = kw("FINECHAN").toDouble * 1000.0
    def nChans: Int = kw("NCHANS").toInt
    def nScans: Int = kw("NSCANS").toInt
    def quackTimS: Double = kw("QUACKTIM").toDouble
    /** Receiver coarse-channel numbers, metafits order. */
    def coarseChans: Vector[Int] =
      kw("CHANNELS").split(",").map(_.trim.toInt).toVector
    def fineChansPerCoarse: Int = nChans / coarseChans.length
    /** Centre frequency, MHz in the container. */
    def freqCentHz: Double = kw("FREQCENT").toDouble * 1e6

    /** flag_init steps from the quack duration (reference
      * FlagContext::from_mwalib, /root/reference/src/flags.rs:133).
      */
    def quackSteps: Int = math.ceil(quackTimS / intTimeS).toInt

    def nAnts: Int = inputs.map(_.ant).distinct.length

    /** CABLEDEL ≠ 0 — cable delays already applied upstream; the CLI
      * auto-skips the cable stage (reference cli.rs:1389-1399).
      */
    def cableApplied: Boolean =
      keywords.get("CABLEDEL").exists(_.toDouble != 0)

    /** GEODEL ≠ 0 — geometric delays already applied
      * (cli.rs:1444-1452).
      */
    def geometryApplied: Boolean =
      keywords.get("GEODEL").exists(_.toDouble != 0)

    /** Correlator version: MWAX metafits carry CORR_VER = 2; a
      * container without the keyword is the legacy correlator. The
      * reference CLI branches passband auto-select and the Van Vleck
      * legacy check on this (cli.rs:1378-1388, 1420-1436).
      */
    def mwaVersion: graft.model.PfbTables.MwaVersion =
      keywords.get("CORR_VER").map(_.trim) match {
        case Some("2") => graft.model.PfbTables.CorrMwaxV2
        case _ => graft.model.PfbTables.CorrLegacy
      }

    private def boolKw(k: String): Boolean =
      keywords.get(k).map(_.trim).exists(v => v == "1" || v == "T")

    /** MWAX oversampled-PFB flag (OVERSAMP keyword). */
    def oversampled: Boolean = boolKw("OVERSAMP")

    /** PFB deripple already applied upstream (DERIPPLE keyword) —
      * auto passband selection becomes a no-op (cli.rs:1416-1418).
      */
    def derippleApplied: Boolean = boolKw("DERIPPLE")

    private def degPair(rk: String, dk: String)
        : Option[(Double, Double)] =
      for (r <- keywords.get(rk); d <- keywords.get(dk))
        yield (r.trim.toDouble, d.trim.toDouble)

    /** Tile pointing centre (RA/DEC keywords), degrees. */
    def pointingCentreDeg: Option[(Double, Double)] =
      degPair("RA", "DEC")

    /** J2000 phase centre: RAPHASE/DECPHASE, falling back to the tile
      * pointing — RADec::from_mwalib_phase_or_pointing semantics.
      */
    def phaseCentreDeg: Option[(Double, Double)] =
      degPair("RAPHASE", "DECPHASE").orElse(pointingCentreDeg)
  }

  // ---- BINTABLE codec --------------------------------------------------

  /** One parsed column: FITS type letter, element count, byte offset of
    * the field inside a row.
    */
  final case class BinCol(name: String, typ: Char, repeat: Int,
                          offset: Int)

  private def typeWidth(t: Char): Int = t match {
    case 'L' | 'B' | 'A' => 1
    case 'I' => 2
    case 'J' | 'E' => 4
    case 'K' | 'D' => 8
    case other => sys.error(s"unsupported TFORM type $other")
  }

  /** Lay out the columns of a BINTABLE HDU from its TTYPEn/TFORMn
    * cards; offsets must sum to NAXIS1 or the header is inconsistent.
    */
  def binColumns(cards: Map[String, String]): Vector[BinCol] = {
    val n = cards.getOrElse("TFIELDS", "0").toInt
    var off = 0
    val cols = (1 to n).toVector.map { i =>
      val name = cards.getOrElse(s"TTYPE$i", s"col$i")
      val form = cards.getOrElse(s"TFORM$i",
        sys.error(s"TFORM$i missing")).trim
      val (digits, letter) = form.span(_.isDigit)
      val repeat = if (digits.isEmpty) 1 else digits.toInt
      val typ = letter.head
      val c = BinCol(name, typ, repeat, off)
      off += repeat * typeWidth(typ)
      c
    }
    val rowLen = cards.getOrElse("NAXIS1", "0").toInt
    require(off == rowLen,
      s"TILEDATA row layout $off bytes != NAXIS1 $rowLen")
    cols
  }

  /** Typed readers over one row buffer (FITS binary tables are
    * big-endian).
    */
  final class BinRow(buf: ByteBuffer, cols: Map[String, BinCol]) {
    private def col(name: String): BinCol = cols.getOrElse(name,
      sys.error(s"TILEDATA column $name missing"))

    def int(name: String, j: Int = 0): Int = {
      val c = col(name)
      c.typ match {
        case 'J' => buf.getInt(c.offset + 4 * j)
        case 'I' => buf.getShort(c.offset + 2 * j).toInt
        case 'K' => buf.getLong(c.offset + 8 * j).toInt
        case 'B' => buf.get(c.offset + j) & 0xff
        case t => sys.error(s"column $name: $t is not integral")
      }
    }

    def ints(name: String): Vector[Int] =
      (0 until col(name).repeat).map(int(name, _)).toVector

    def float(name: String): Double = {
      val c = col(name)
      c.typ match {
        case 'E' => buf.getFloat(c.offset).toDouble
        case 'D' => buf.getDouble(c.offset)
        case t => sys.error(s"column $name: $t is not floating")
      }
    }

    def str(name: String): String = {
      val c = col(name)
      val bytes = new Array[Byte](c.repeat)
      var i = 0
      while (i < c.repeat) { bytes(i) = buf.get(c.offset + i); i += 1 }
      new String(bytes, "ASCII").trim
    }
  }

  /** Coax velocity factor: a Length value WITHOUT the EL_ prefix is a
    * physical cable length in metres, converted to electrical length by
    * this factor (the public mwalib convention the reference inherits
    * via its MetafitsContext, /root/reference/src/corrections.rs:118-127).
    */
  val CoaxVFactor: Double = 1.204

  /** Electrical length from the Length column: `EL_<metres>` means the
    * value IS the pre-measured electrical length; a bare number is a
    * physical length, scaled by [[CoaxVFactor]].
    */
  def elecLen(lengthField: String): Double =
    if (lengthField.startsWith("EL_"))
      lengthField.stripPrefix("EL_").toDouble
    else lengthField.trim.toDouble * CoaxVFactor

  // ---- file → Metafits -------------------------------------------------

  def read(path: String,
           conf: Configuration = new Configuration()): Metafits = {
    val rd = new SlabIO.SlabReader(path, conf)
    try {
      val hdus = FitsGpubox.scanHdus(rd)
      require(hdus.nonEmpty, s"no HDUs in $path")
      val primary = hdus.head.cards
      val tile = hdus.tail
        .find(h => h.cards.get("XTENSION").exists(_ == "BINTABLE") &&
          h.cards.get("EXTNAME").exists(_ == "TILEDATA"))
        .getOrElse(sys.error(s"no TILEDATA BINTABLE in $path"))
      val cols = binColumns(tile.cards)
      val byName = cols.map(c => c.name -> c).toMap
      val rowLen = tile.cards("NAXIS1").toInt
      val nRows = tile.cards("NAXIS2").toInt
      val inputs = (0 until nRows).toVector.map { r =>
        val buf = rd.readAt(tile.dataPos + r.toLong * rowLen, rowLen)
          .order(ByteOrder.BIG_ENDIAN)
        val row = new BinRow(buf, byName)
        RfInput(
          input = row.int("Input"),
          ant = row.int("Antenna"),
          tileName = row.str("TileName"),
          pol = row.str("Pol"),
          flagged = row.int("Flag") != 0,
          elecLenM = elecLen(row.str("Length")),
          eastM = row.float("East"),
          northM = row.float("North"),
          heightM = row.float("Height"),
          gains = row.ints("Gains"),
          rx = row.int("Rx"),
          slot = row.int("Slot"))
      }
      Metafits(primary, inputs)
    } finally rd.close()
  }

  // ---- Metafits → Dims-layout DataFrames ------------------------------

  /** Antenna table in the [[graft.model.Dims.antenna]] layout, from the
    * X/Y input pair of each tile. Broadcast-sized: 2 rows per tile in,
    * one row per antenna out.
    */
  def antenna(spark: SparkSession, mf: Metafits): DataFrame = {
    import spark.implicits._
    val byAnt = mf.inputs.groupBy(_.ant).toVector.sortBy(_._1)
    val rows = byAnt.map { case (ant, ins) =>
      val x = ins.find(_.pol == "X").getOrElse(
        sys.error(s"antenna $ant has no X input"))
      val y = ins.find(_.pol == "Y").getOrElse(
        sys.error(s"antenna $ant has no Y input"))
      (ant.toLong, x.flagged || y.flagged, x.elecLenM, y.elecLenM,
        x.eastM, x.northM, x.heightM, x.tileName.trim)
    }
    rows.toDF("ant", "ant_flagged", "elec_len_x_m", "elec_len_y_m",
      "east_m", "north_m", "height_m", "tile_name")
  }

  /** Digital gains in the [[graft.model.Dims.digitalGain]] layout:
    * per (antenna, coarse-chan-index), raw metafits integers / 64
    * (reference corrections.rs:356-365).
    */
  def digitalGain(spark: SparkSession, mf: Metafits): DataFrame = {
    import spark.implicits._
    val byAnt = mf.inputs.groupBy(_.ant).toVector.sortBy(_._1)
    val rows = byAnt.flatMap { case (ant, ins) =>
      val x = ins.find(_.pol == "X").get
      val y = ins.find(_.pol == "Y").get
      mf.coarseChans.indices.map { cc =>
        (ant.toLong, cc.toLong,
          x.gains(cc).toDouble / 64.0, y.gains(cc).toDouble / 64.0)
      }
    }
    rows.toDF("ant", "cc", "gain_x", "gain_y")
  }

  /** Timestep table in the [[graft.model.Dims.timestep]] layout: NSCANS
    * steps from GPSTIME, quack steps flagged at the start (reference
    * flag_init, flags.rs:133+165-172) and `flagEnd` at the end (the
    * common-end trim, a CLI decision rather than a metafits field).
    */
  def timestep(spark: SparkSession, mf: Metafits,
               flagEnd: Int = 1): DataFrame = {
    val it = mf.intTimeS
    spark.range(0, mf.nScans, 1, 1).select(
      col("id").as("t"),
      (lit(mf.obsId) + (col("id") * it).cast("long")).as("gps_s"),
      (lit(mf.obsId.toDouble) + col("id") * it + it / 2)
        .as("centroid_s"),
      (col("id") < mf.quackSteps ||
        col("id") >= mf.nScans - flagEnd).as("ts_flag"))
  }

  /** Fine-channel table in the [[graft.model.Dims.chan]] layout; centre
    * frequencies reconstructed from FREQCENT/FINECHAN/NCHANS, edge+DC
    * static flags per coarse channel.
    */
  def chan(spark: SparkSession, mf: Metafits): DataFrame = {
    val w = mf.fineChanWidthHz
    val fpc = mf.fineChansPerCoarse
    // FREQCENT is decimal MHz (not exactly representable in binary);
    // MWA centre frequencies are integer Hz, so snap the reconstructed
    // chan-0 centre to the grid the container means
    val base = math.round(mf.freqCentHz - w * (mf.nChans / 2.0)).toDouble
    spark.range(0, mf.nChans, 1, 1).select(
      col("id").as("chan"),
      floor(col("id") / fpc).as("cc"),
      (col("id") % fpc).as("fc"),
      (lit(base) + col("id") * w).as("freq_hz"))
      .withColumn("ch_flag",
        col("fc") === 0 || col("fc") === fpc - 1 ||
          col("fc") === fpc / 2)
  }
}

/** [[graft.model.MetaSource]] backed by a parsed metafits: every
  * correction operator runs on real-container metadata through the
  * same seam the synthetic observation uses.
  */
final case class MetafitsMeta(mf: MetafitsReader.Metafits)
    extends graft.model.MetaSource {
  def antenna(s: SparkSession): DataFrame =
    MetafitsReader.antenna(s, mf)
  def timestep(s: SparkSession): DataFrame =
    MetafitsReader.timestep(s, mf)
  def chan(s: SparkSession): DataFrame = MetafitsReader.chan(s, mf)
  def baseline(s: SparkSession): DataFrame =
    graft.model.Dims.baselineFrom(antenna(s), mf.nAnts)
  def digitalGain(s: SparkSession): DataFrame =
    MetafitsReader.digitalGain(s, mf)
  def flaggedAnts(s: SparkSession): Seq[Long] =
    mf.inputs.filter(_.flagged).map(_.ant.toLong).distinct.sorted
  override def cableApplied: Boolean = mf.cableApplied
  override def geometryApplied: Boolean = mf.geometryApplied
  override def intTimeS: Double = mf.intTimeS
  override def weightFactor: Double =
    (mf.fineChanWidthHz / 10000.0) * mf.intTimeS
  override def fineChanWidthHz: Double = mf.fineChanWidthHz
  override def nAnts: Int = mf.nAnts
  override def nChans: Int = mf.nChans
  override def nScans: Int = mf.nScans
  override def fineChansPerCoarse: Int = mf.fineChansPerCoarse
  override def gpsStartS: Double = mf.obsId.toDouble
  override def baseFreqHz: Double =
    math.round(mf.freqCentHz
      - mf.fineChanWidthHz * (mf.nChans / 2.0)).toDouble
  override def mwaVersion: graft.model.PfbTables.MwaVersion =
    mf.mwaVersion
  override def oversampled: Boolean = mf.oversampled
  override def derippleApplied: Boolean = mf.derippleApplied
  override def phaseCentreDeg: Option[(Double, Double)] =
    mf.phaseCentreDeg
  override def pointingCentreDeg: Option[(Double, Double)] =
    mf.pointingCentreDeg
}
