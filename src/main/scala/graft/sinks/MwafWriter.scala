package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}

import graft.model.Obs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K3: mwaf-style binary flag files
  * (/root/reference/src/io/mwaf.rs): one FITS file per coarse channel
  * (template `%%` → gpubox id, mwaf.rs:105-138), header keys
  * VERSION/OBSID/GPSSTART/NCHANS/NANTENNA/NSCANS (mwaf.rs:263-349), and
  * a FLAGS bit-column table with one row per (timestep, baseline), each
  * cell a fine-channel bitvector (mwaf.rs:424-495). `finalise` verifies
  * the row count (mwaf.rs:504-510) — mirrored here by a require().
  *
  * The bit-packing runs distributed (the [[Sinks.mwafBitmask]]
  * aggregate); only the final per-cc byte streams pass through the
  * driver, one coarse channel at a time (the reference writes its
  * per-gpubox files in parallel the same way, mwaf.rs:399-417).
  */
object MwafWriter {

  private def card(key: String, value: String): String =
    (key.take(8).padTo(8, ' ') + "= " +
      value.reverse.padTo(20, ' ').reverse).padTo(80, ' ')

  /** Write one file per coarse channel into `dir`, named
    * `flags_%%.mwaf` with %% = coarse channel id. Returns rows written
    * per cc.
    */
  def write(visFlagged: DataFrame, dir: String,
            template: String = "flags_%%.mwaf"): Map[Long, Long] = {
    val spark = visFlagged.sparkSession
    // densify to the full (cc, t, bl) grid — the reference's tables are
    // dense by construction; cells with NO data are fully flagged
    // (missing-HDU semantics, /root/reference/src/io/mod.rs:297-303),
    // matching GpuboxSource's flag=!present on ingest
    val allFlagged = (1L << graft.model.Obs.FineChansPerCoarse) - 1L
    val grid = visFlagged.select("cc").distinct()
      .crossJoin(graft.model.Dims.timestep(spark).select("t"))
      .crossJoin(graft.model.Dims.baseline(spark).select("bl"))
    val masks = grid
      .join(Sinks.mwafBitmask(visFlagged), Seq("cc", "t", "bl"), "left")
      .withColumn("flag_mask", coalesce(col("flag_mask"),
        lit(allFlagged)))
      .repartitionByRange(8, col("cc"))
      .sortWithinPartitions("cc", "t", "bl")
      .select("cc", "t", "bl", "flag_mask")
    // stream the globally-ordered rows (driver memory O(1)); file
    // boundaries on cc change. nScans/nBl come from the dense grid.
    val nScans = Obs.NumTimesteps
    val nBl = Obs.NumAnts * (Obs.NumAnts + 1) / 2
    val bytesPerRow = (Obs.FineChansPerCoarse + 7) / 8
    val header = Seq(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      card("VERSION", "'2.0'"),
      card("OBSID", Obs.GpsStart.toString),
      card("GPSSTART", Obs.GpsStart.toString),
      card("NCHANS", Obs.FineChansPerCoarse.toString),
      card("NANTENNA", Obs.NumAnts.toString),
      card("NSCANS", nScans.toString),
      "END".padTo(80, ' ')).mkString
    val headPad = header + " " * ((2880 - header.length % 2880) % 2880)

    var out: BufferedOutputStream = null
    var curCc = -1L
    var rowsInFile = 0L
    val counts = scala.collection.mutable.Map[Long, Long]()
    def closeFile(): Unit = if (out != null) {
      val dataLen = rowsInFile * bytesPerRow
      out.write(new Array[Byte](((2880 - dataLen % 2880) % 2880).toInt))
      out.close()
      require(rowsInFile == nScans.toLong * nBl,
        s"mwaf row-count invariant: $rowsInFile != $nScans*$nBl")
      counts(curCc) = rowsInFile
    }
    masks.toLocalIterator().forEachRemaining { r =>
      val cc = r.getLong(0)
      if (cc != curCc) {
        closeFile()
        curCc = cc
        rowsInFile = 0
        out = new BufferedOutputStream(new FileOutputStream(
          dir + "/" + template.replace("%%", cc.toString)))
        out.write(headPad.getBytes("ASCII"))
      }
      val mask = r.getLong(3)
      var b = 0
      while (b < bytesPerRow) {
        out.write(((mask >> (8 * b)) & 0xff).toInt)
        b += 1
      }
      rowsInFile += 1
    }
    closeFile()
    counts.toMap
  }
}
