package graft

import java.nio.file.{Files, Paths}

import graft.model.{Dims, Obs}
import graft.ops.FlagOps
import graft.sinks.MwafWriter
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** mwaf sink: one file per coarse channel, dense row grid, header keys,
  * block alignment.
  */
class MwafSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mwaf write: per-cc files, dense rows, aligned, flags present") {
    val dir = Files.createTempDirectory("mwaf").toString
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    val counts = MwafWriter.write(flagged, dir)
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    val expectRows = Obs.NumTimesteps * 36 // dense grid: 16 ts x 36 bl
    counts.values.foreach(n => assert(n == expectRows))
    for (cc <- 0 until 4) {
      val bytes = Files.readAllBytes(Paths.get(s"$dir/flags_$cc.mwaf"))
      assert(bytes.length % 2880 == 0)
      val head = new String(bytes.take(2880), "ASCII")
      assert(head.startsWith("SIMPLE  =                    T"))
      assert(head.contains("NSCANS"))
      // at least one flagged fine-channel bit somewhere in the payload
      assert(bytes.drop(2880).exists(_ != 0))
    }
  }

  test("bitmask handles fine channels past 32; width > 64 fails loudly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // fc = 40 would wrap to bit 8 under a 32-bit shift — the BIGINT
    // shift must set bit 40 exactly
    val wide = Seq((0L, 0L, 0L, 40L, true), (0L, 0L, 0L, 2L, true),
      (0L, 0L, 0L, 63L, true), (0L, 0L, 0L, 10L, false))
      .toDF("cc", "bl", "t", "fc", "flag")
    val mask = graft.sinks.Sinks.mwafBitmask(wide)
      .select("flag_mask").head().getLong(0)
    assert(mask == ((1L << 40) | (1L << 2) | (1L << 63)),
      s"got mask $mask")

    // a 128-chans-per-coarse container (real legacy MWA) must be
    // rejected, not silently truncated to its low 64 bits
    val meta128 = new graft.model.MetaSource {
      def antenna(s: org.apache.spark.sql.SparkSession) =
        Dims.antenna(s)
      def timestep(s: org.apache.spark.sql.SparkSession) =
        Dims.timestep(s)
      def chan(s: org.apache.spark.sql.SparkSession) = Dims.chan(s)
      def baseline(s: org.apache.spark.sql.SparkSession) =
        Dims.baseline(s)
      def digitalGain(s: org.apache.spark.sql.SparkSession) =
        Dims.digitalGain(s)
      def flaggedAnts(s: org.apache.spark.sql.SparkSession) = Seq(7L)
      override def fineChansPerCoarse: Int = 128
    }
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    val ex = intercept[IllegalArgumentException] {
      MwafWriter.write(flagged,
        Files.createTempDirectory("mwaf_wide").toString,
        meta = meta128)
    }
    assert(ex.getMessage.contains("64 fine chans"))
  }

  test("mwaf extensions are standard-conforming FITS BINTABLEs " +
    "(mandatory cards, reference column names/types)") {
    val dir = Files.createTempDirectory("mwaf_cards").toString
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    MwafWriter.write(flagged, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val rd = new graft.sources.SlabIO.SlabReader(s"$dir/flags_0.mwaf",
      conf)
    try {
      import graft.sources.MwafReader.{findExt, strVal}
      // every extension: the BINTABLE mandatory-card set in the
      // standard's order semantics (astropy-parseable), EXTNAME, and
      // the reference's TTYPE/TFORM pairs (mwaf.rs:547-624)
      val expect = Map(
        "FLAGS" -> Seq(("FLAGS", "8X")), // 8 fine chans per coarse
        "CH_OCC" -> Seq(("Index", "1J"), ("Count", "1K"),
          ("Occupancy", "1D")),
        "BL_OCC" -> Seq(("Index", "1J"), ("Antenna1", "1J"),
          ("Antenna2", "1J"), ("Count", "1K"), ("Occupancy", "1D")),
        "TILES" -> Seq(("Antenna", "1J"), ("TileName", "8A")))
      expect.foreach { case (extname, fields) =>
        val (cards, _) = findExt(rd, extname)
        assert(strVal(cards("XTENSION")) == "BINTABLE", extname)
        assert(cards("BITPIX").toInt == 8, extname)
        assert(cards("NAXIS").toInt == 2, extname)
        assert(cards("PCOUNT").toInt == 0, extname)
        assert(cards("GCOUNT").toInt == 1, extname)
        assert(cards("TFIELDS").toInt == fields.length, extname)
        fields.zipWithIndex.foreach { case ((ttype, tform), i) =>
          assert(strVal(cards(s"TTYPE${i + 1}")) == ttype,
            s"$extname TTYPE${i + 1}")
          assert(strVal(cards(s"TFORM${i + 1}")) == tform,
            s"$extname TFORM${i + 1}")
        }
      }
    } finally rd.close()
  }
}
