package graft.sources

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3: reader for the MWAOCAL `.bin` DI-calibration format
  * (/root/reference/src/io/aocal.rs:35-141).
  *
  * Layout (all little-endian):
  *  - 7 ASCII bytes "MWAOCAL", 9 zero bytes
  *  - u32 num_timeblocks, u32 num_tiles, u32 num_chans, u32 num_pols
  *  - f64 start_gps, f64 end_gps (0.0 ⇒ absent)
  *  - f64 x (timeblocks x tiles x chans x 2*pols): Jones components
  *    XX_re, XX_im, XY_re, XY_im, YX_re, YX_im, YY_re, YY_im
  *
  * Calsols are metadata-sized (tiles x chans), so this is a driver-side
  * read that lands in a broadcastable DataFrame — the same disposition as
  * the reference, which loads the whole file into memory and indexes it
  * per antenna (only 1 timeblock may be applied,
  * /root/reference/src/cli.rs:1639-1645).
  */
object AOCalReader {

  case class AOCalSols(numTimeblocks: Int, numTiles: Int, numChans: Int,
                       startGps: Option[Double], endGps: Option[Double],
                       // [timeblock][tile][chan][8]
                       jones: Array[Array[Array[Array[Double]]]])

  def read(path: String): AOCalSols = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](7)
    buf.get(magic)
    require(new String(magic, "ASCII") == "MWAOCAL",
      s"bad magic in $path: ${new String(magic, "ASCII")}")
    (0 until 9).foreach { _ =>
      require(buf.get() == 0, s"nonzero reserved byte in $path")
    }
    val numTimeblocks = buf.getInt()
    val numTiles = buf.getInt()
    val numChans = buf.getInt()
    val numPols = buf.getInt()
    require(numPols == 4, s"expected 4 pols, got $numPols")
    val startT = buf.getDouble()
    val endT = buf.getDouble()
    val jones = Array.ofDim[Array[Double]](numTimeblocks, numTiles,
      numChans)
    for (tb <- 0 until numTimeblocks; tile <- 0 until numTiles;
         ch <- 0 until numChans) {
      val j = new Array[Double](8)
      var k = 0
      while (k < 8) { j(k) = buf.getDouble(); k += 1 }
      jones(tb)(tile)(ch) = j
    }
    AOCalSols(numTimeblocks, numTiles, numChans,
      if (math.abs(startT) < Double.MinPositiveValue) None else Some(startT),
      if (math.abs(endT) < Double.MinPositiveValue) None else Some(endT),
      jones)
  }

  /** Write the format (fixture generation / round-trip tests). */
  def write(path: String, sols: AOCalSols): Unit = {
    val n = sols.numTimeblocks * sols.numTiles * sols.numChans * 8
    val buf = ByteBuffer.allocate(7 + 9 + 16 + 16 + n * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("MWAOCAL".getBytes("ASCII"))
    (0 until 9).foreach(_ => buf.put(0.toByte))
    buf.putInt(sols.numTimeblocks).putInt(sols.numTiles)
      .putInt(sols.numChans).putInt(4)
    buf.putDouble(sols.startGps.getOrElse(0.0))
    buf.putDouble(sols.endGps.getOrElse(0.0))
    for (tb <- 0 until sols.numTimeblocks; tile <- 0 until sols.numTiles;
         ch <- 0 until sols.numChans; k <- 0 until 8)
      buf.putDouble(sols.jones(tb)(tile)(ch)(k))
    Files.write(Paths.get(path), buf.array())
  }

  /** Timeblock 0 as a broadcastable calsol DataFrame
    * (ant, cal_chan, j0..j7) — the shape graft.ops.Calibration consumes.
    */
  def toDataFrame(spark: SparkSession, sols: AOCalSols,
                  timeblock: Int = 0): DataFrame = {
    import spark.implicits._
    val rows = for {
      tile <- 0 until sols.numTiles
      ch <- 0 until sols.numChans
    } yield {
      val j = sols.jones(timeblock)(tile)(ch)
      (tile.toLong, ch.toLong, j(0), j(1), j(2), j(3), j(4), j(5), j(6),
        j(7))
    }
    rows.toDF("ant", "cal_chan", "j0", "j1", "j2", "j3", "j4", "j5",
      "j6", "j7")
  }
}
