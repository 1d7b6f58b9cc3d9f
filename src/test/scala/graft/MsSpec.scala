package graft

import java.nio.file.Files

import graft.model.Dims
import graft.ops._
import graft.sinks.MsWriter
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural checks on the Measurement Set parquet mirror: MAIN row
  * count and order invariants, DATA matrix shape, subtable shapes —
  * mirroring the reference's MS golden checks (compare_ms_with_csv,
  * /root/reference/src/test_common.rs:482).
  */
class MsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ms export: row order, matrix shape, subtables") {
    val dir = "/root/testdata/sf0.001"
    val vis = VisSynth.vis(spark, dir)
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(vis,
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = GeometryCorrection.partUvw(Dims.timestep(spark),
      Dims.antenna(spark))

    val out = Files.createTempDirectory("ms").toString
    val n = MsWriter.write(avg, uvw, Dims.antenna(spark), out)

    // row-count invariant: one MAIN row per (t_out, bl)
    val expected = avg.select("t_out", "bl").distinct().count()
    assert(n == expected)

    val main = spark.read.parquet(s"$out/MAIN")
    // row_idx is the contiguous 0..n-1 enumeration of (t_out, bl) order
    val mis = main.select(
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("t_out", "bl")) - 1).as("expect_idx"),
      col("row_idx")).where(col("expect_idx") =!= col("row_idx")).count()
    assert(mis == 0, s"$mis rows out of MS order")

    // DATA matrix: one chan entry per averaged channel, 8 components each
    val bad = main.where(size(col("data")) =!= col("n_chan") ||
      size(col("weight_spectrum")) =!= col("n_chan") ||
      size(col("flag")) =!= col("n_chan")).count()
    assert(bad == 0, s"$bad rows with ragged DATA/WEIGHT/FLAG")
    val jones = main.select(explode(col("data")).as("cell"))
      .where(size(col("cell")) =!= 8).count()
    assert(jones == 0, "DATA cells must have 8 Jones components")

    // time axis: interval/exposure constant, time strictly increasing
    // with t_out
    val t = main.select("t_out", "time_s", "interval_s").distinct()
      .orderBy("t_out").collect()
    assert(t.forall(_.getDouble(2) == 4.0))
    assert(t.sliding(2).forall(p => p.length < 2 ||
      p(1).getDouble(1) - p(0).getDouble(1) == 4.0 *
        (p(1).getLong(0) - p(0).getLong(0))))

    // subtables
    assert(spark.read.parquet(s"$out/ANTENNA").count() == 8)
    val spw = spark.read.parquet(s"$out/SPECTRAL_WINDOW").head()
    assert(spw.getAs[Long]("num_chan") == 16)
    assert(spw.getSeq[Double](spw.fieldIndex("chan_freq_hz")).length == 16)
    val pol = spark.read.parquet(s"$out/POLARIZATION").head()
    assert(pol.getSeq[Int](pol.fieldIndex("corr_type")).toSeq == Seq(9, 10, 11, 12))
    assert(spark.read.parquet(s"$out/FIELD").count() == 1)
    assert(spark.read.parquet(s"$out/OBSERVATION").count() == 1)
  }
}
