package graft

import java.nio.file.Files

import graft.sources.{AOCalReader, FitsGpubox, GpuboxSource}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip specs for the binary sources (S1 gpubox-like container,
  * S3 MWAOCAL calsols).
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("aocal: write/read round trip preserves header and jones") {
    val dir = Files.createTempDirectory("aocal").toString
    val path = s"$dir/cal.bin"
    val jones = Array.tabulate(1, 4, 6) { (tb, tile, ch) =>
      Array.tabulate(8)(k => tb + tile * 0.5 + ch * 0.25 + k * 0.125)
    }
    val sols = AOCalReader.AOCalSols(1, 4, 6, Some(1254670392.0),
      Some(1254670492.0), jones)
    AOCalReader.write(path, sols)
    val back = AOCalReader.read(path)
    assert(back.numTimeblocks == 1 && back.numTiles == 4
      && back.numChans == 6)
    assert(back.startGps.contains(1254670392.0))
    assert(back.jones(0)(3)(5).toSeq == jones(0)(3)(5).toSeq)
    val df = AOCalReader.toDataFrame(spark, back)
    assert(df.count() == 24)
    assert(df.columns.toSeq ==
      Seq("ant", "cal_chan") ++ (0 until 8).map(k => s"j$k"))
  }

  test("gpubox: decode recovers lineage-encoded cells and flags missing slabs") {
    val dir = Files.createTempDirectory("gbx").toString
    // cc=0 complete (4 ts), cc=1 truncated after 2 of 4 ts
    GpuboxSource.writeFixture(s"$dir/g0.gbx", cc = 0, nTs = 4, nAnts = 3,
      fpc = 2, presentSlabs = 4)
    GpuboxSource.writeFixture(s"$dir/g1.gbx", cc = 1, nTs = 4, nAnts = 3,
      fpc = 2, presentSlabs = 2)
    val df = GpuboxSource.read(spark, dir, nAnts = 3).cache()
    val nBl = GpuboxSource.antPairs(3).length // 6
    assert(df.count() == 2 * 4 * nBl * 2)
    // missing slabs: cc=1, t in {2,3} -> flagged, zero
    import org.apache.spark.sql.functions._
    assert(df.where(col("flag")).count() == 2L * nBl * 2)
    assert(df.where(col("flag") && col("cc") === 1 && col("t") >= 2)
      .count() == 2L * nBl * 2)
    // lineage: cc=0, t=1, blIdx=2 (pair (0,2)), fc=1, k=3 ->
    // value = 0*1e5 + 1*1e4 + 2*100 + 1*10 + 3 = 10213
    val cell = df.where(col("cc") === 0 && col("t") === 1 &&
      col("ant1") === 0 && col("ant2") === 2 && col("fc") === 1)
      .select("v3").head().getDouble(0)
    assert(cell == 10213.0f.toDouble)
  }

  test("fits gpubox: decode matches the GBX1 reader cell-for-cell") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("fgbx").toString
    FitsGpubox.writeFixture(s"$dir/g0.fits", cc = 0, nTs = 4, nAnts = 3,
      fpc = 2, presentSlabs = 4)
    FitsGpubox.writeFixture(s"$dir/g1.fits", cc = 1, nTs = 4, nAnts = 3,
      fpc = 2, presentSlabs = 2)
    val fits = FitsGpubox.read(spark, dir, nAnts = 3).cache()
    val nBl = GpuboxSource.antPairs(3).length
    assert(fits.count() == 2 * 4 * nBl * 2)
    assert(fits.where(col("flag")).count() == 2L * nBl * 2)
    // identical long-format content to the GBX1 container of the same
    // lineage fixture (both encode [baseline][chan][pol][complex])
    val dirG = Files.createTempDirectory("fgbx2").toString
    GpuboxSource.writeFixture(s"$dirG/g0.gbx", cc = 0, nTs = 4,
      nAnts = 3, fpc = 2, presentSlabs = 4)
    GpuboxSource.writeFixture(s"$dirG/g1.gbx", cc = 1, nTs = 4,
      nAnts = 3, fpc = 2, presentSlabs = 2)
    val gbx = GpuboxSource.read(spark, dirG, nAnts = 3)
    assert(fits.exceptAll(gbx).count() == 0)
    assert(gbx.exceptAll(fits).count() == 0)
    // header sanity: the primary block parses back
    val rd = new graft.sources.SlabIO.SlabReader(s"$dir/g0.fits")
    val hdus = FitsGpubox.scanHdus(rd)
    rd.close()
    assert(hdus.length == 5) // primary + 4 image HDUs
    assert(hdus.head.cards("NSCANS") == "4")
    assert(hdus(1).cards("BITPIX") == "-32")
  }

  test("fits gpubox: file truncated mid-data flags the slab, not zeros") {
    val dir = Files.createTempDirectory("fgbx3").toString
    FitsGpubox.writeFixture(s"$dir/g0.fits", cc = 0, nTs = 3, nAnts = 3,
      fpc = 2, presentSlabs = 3)
    // cut the file in the middle of the LAST image HDU's data unit:
    // its header block stays whole, so only the dataLen-past-EOF guard
    // can reject it
    val path = java.nio.file.Paths.get(s"$dir/g0.fits")
    val bytes = Files.readAllBytes(path)
    Files.write(path, bytes.take(bytes.length - 2600))
    val rows = FitsGpubox.decodeFile(s"$dir/g0.fits", 3).toSeq
    val nBl = GpuboxSource.antPairs(3).length
    assert(rows.size == 3 * nBl * 2)
    // t = 2 (the truncated slab) must come back flagged with zero data
    val flaggedT = rows.filter(r => r.getBoolean(15)).map(_.getLong(0))
    assert(flaggedT.nonEmpty && flaggedT.forall(_ == 2L),
      s"only the truncated slab should flag: $flaggedT")
  }
}
