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
    // dense by construction; sparse synthetic cells become zero masks
    val grid = visFlagged.select("cc").distinct()
      .crossJoin(graft.model.Dims.timestep(spark).select("t"))
      .crossJoin(graft.model.Dims.baseline(spark).select("bl"))
    val masks = grid
      .join(Sinks.mwafBitmask(visFlagged), Seq("cc", "t", "bl"), "left")
      .withColumn("flag_mask", coalesce(col("flag_mask"), lit(0L)))
      .repartitionByRange(8, col("cc"))
      .sortWithinPartitions("cc", "t", "bl")
      .select("cc", "t", "bl", "flag_mask")
    val byCc = masks.collect().groupBy(_.getLong(0))
    val bytesPerRow = (Obs.FineChansPerCoarse + 7) / 8
    byCc.map { case (cc, rows) =>
      val nScans = rows.map(_.getLong(1)).distinct.length
      val nBl = rows.map(_.getLong(2)).distinct.length
      val header = Seq(
        card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
        card("VERSION", "'2.0'"),
        card("OBSID", Obs.GpsStart.toString),
        card("GPSSTART", Obs.GpsStart.toString),
        card("NCHANS", Obs.FineChansPerCoarse.toString),
        card("NANTENNA", Obs.NumAnts.toString),
        card("NSCANS", nScans.toString),
        card("GPUBOXNO", cc.toString),
        "END".padTo(80, ' '))
      val head = header.mkString
      val headPad = head + " " * ((2880 - head.length % 2880) % 2880)
      val path = dir + "/" + template.replace("%%", cc.toString)
      val out = new BufferedOutputStream(new FileOutputStream(path))
      out.write(headPad.getBytes("ASCII"))
      rows.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
        val mask = r.getLong(3)
        var b = 0
        while (b < bytesPerRow) {
          out.write(((mask >> (8 * b)) & 0xff).toInt)
          b += 1
        }
      }
      val dataLen = rows.length * bytesPerRow
      out.write(new Array[Byte]((2880 - dataLen % 2880) % 2880))
      out.close()
      require(rows.length.toLong == nScans.toLong * nBl,
        s"mwaf row-count invariant: ${rows.length} != $nScans*$nBl")
      cc -> rows.length.toLong
    }
  }
}
