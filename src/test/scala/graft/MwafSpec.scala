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
}
