package graft

import java.nio.file.Files

import graft.model.Dims
import graft.ops._
import graft.sinks.{MsContainer, MsWriter}
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MS container round trip: the casacore-shaped directory export
  * (table.dat/table.f0 per table) must parse back bit-for-bit and
  * match the parquet mirror's MAIN skeleton in MS row order.
  */
class MsContainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def conf = spark.sparkContext.hadoopConfiguration

  test("descriptor serialization round-trips") {
    val cols = MsContainer.mainCols(16)
    val (back, n) = MsContainer.parseDescriptor(
      MsContainer.descriptor(cols, 288L))
    assert(back == cols && n == 288L)
  }

  test("container MAIN matches the mirror skeleton in row order") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))

    val out = Files.createTempDirectory("msc").toString + "/obs.ms"
    val n = MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val mirror = MsWriter.msMain(avg, uvw).orderBy("row_idx").collect()
    assert(n == mirror.length.toLong)

    val (cols, nRows, data) = MsContainer.readTable(out, conf)
    assert(nRows == n)
    mirror.zipWithIndex.foreach { case (m, i) =>
      val r = i.toLong
      // scalars are f64/exact — bit-for-bit vs the mirror
      assert(MsContainer.cell(cols, data, r, "TIME").head ==
        m.getAs[Double]("time_s"), s"TIME row $i")
      assert(MsContainer.cell(cols, data, r, "ANTENNA1").head ==
        m.getAs[Long]("ant1").toDouble)
      assert(MsContainer.cell(cols, data, r, "ANTENNA2").head ==
        m.getAs[Long]("ant2").toDouble)
      val uvwCell = MsContainer.cell(cols, data, r, "UVW")
      assert(uvwCell == Seq(m.getAs[Double]("u_m"),
        m.getAs[Double]("v_m"), m.getAs[Double]("w_m")), s"UVW row $i")
      assert(MsContainer.cell(cols, data, r, "FLAG_ROW").head ==
        (if (m.getAs[Boolean]("flag_row")) 1.0 else 0.0))
    }
  }

  test("container DATA carries the averaged payload at f32") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2).cache()
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val out = Files.createTempDirectory("msc2").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val (cols, _, data) = MsContainer.readTable(out, conf)
    val skeleton = MsWriter.msMain(avg, uvw)
      .select("row_idx", "t_out", "bl").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    val cells = avg.select("t_out", "bl", "c_out", "a0", "a7",
      "weight_out", "flag_out").collect()
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val row = skeleton((c.getLong(0), c.getLong(1)))
      val ch = c.getLong(2).toInt
      val d = MsContainer.cell(cols, data, row, "DATA")
      // pol 0 (XX) re/im of this channel
      assert(d(ch * 8) == c.getDouble(3).toFloat.toDouble,
        s"DATA re (t_out=${c.getLong(0)}, bl=${c.getLong(1)}, ch=$ch)")
      // pol 3 (YY) re = a6... spot-check weight + flag planes instead
      val w = MsContainer.cell(cols, data, row, "WEIGHT_SPECTRUM")
      assert(w(ch * 4) == c.getDouble(5).toFloat.toDouble)
      val f = MsContainer.cell(cols, data, row, "FLAG")
      assert(f(ch * 4) == (if (c.getBoolean(6)) 1.0 else 0.0))
    }
    avg.unpersist()
  }

  test("subtables parse back") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val out = Files.createTempDirectory("msc3").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val (aCols, aRows, aData) = MsContainer.readTable(s"$out/ANTENNA",
      conf)
    assert(aRows == 8)
    assert(MsContainer.strCell(aCols, aData, 0, "NAME") == "Tile000")
    assert(MsContainer.strCell(aCols, aData, 7, "MOUNT") == "ALT-AZ")
    val pos0 = MsContainer.cell(aCols, aData, 0, "POSITION")
    assert(pos0 == Seq(-150.0, -50.0, 377.0)) // ant 0 ENH

    val (sCols, sRows, sData) =
      MsContainer.readTable(s"$out/SPECTRAL_WINDOW", conf)
    assert(sRows == 1)
    assert(MsContainer.cell(sCols, sData, 0, "NUM_CHAN").head == 16.0)
    val freqs = MsContainer.cell(sCols, sData, 0, "CHAN_FREQ")
    assert(freqs.length == 16 && freqs.head == 1.5e8 + 20000.0)

    val (pCols, pRows, pData) =
      MsContainer.readTable(s"$out/POLARIZATION", conf)
    assert(pRows == 1)
    assert(MsContainer.cell(pCols, pData, 0, "CORR_TYPE") ==
      Seq(9.0, 10.0, 11.0, 12.0))

    val (fCols, fRows, fData) = MsContainer.readTable(s"$out/FIELD",
      conf)
    assert(fRows == 1)
    assert(MsContainer.strCell(fCols, fData, 0, "NAME") == "GRAFT")
    // default PHASE_DIR is a real RA/Dec (the fixed gate ephemeris),
    // not the geometry stage's hour-angle constant
    assert(MsContainer.cell(fCols, fData, 0, "PHASE_DIR") ==
      Seq(graft.ops.GeometryCorrection.AppRaJ2000,
        graft.ops.GeometryCorrection.AppDecJ2000))

    val (oCols, oRows, oData) =
      MsContainer.readTable(s"$out/OBSERVATION", conf)
    assert(oRows == 1)
    assert(MsContainer.strCell(oCols, oData, 0, "TELESCOPE_NAME") ==
      "MWA")
    val tr = MsContainer.cell(oCols, oData, 0, "TIME_RANGE")
    assert(tr.length == 2 && tr(1) - tr(0) == 32.0) // 16 steps x 2 s
  }
}
