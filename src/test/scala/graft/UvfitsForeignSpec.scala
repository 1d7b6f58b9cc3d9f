package graft

import java.nio.ByteBuffer
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Third-party uvfits layouts: group parameters located via PTYPE
  * cards, not fixed indices — a file with BASELINE first and a single
  * DATE parameter must decode identically.
  */
class UvfitsForeignSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def card(key: String, value: String): String =
    (key.take(8).padTo(8, ' ') + "= " +
      value.reverse.padTo(20, ' ').reverse).padTo(80, ' ')

  test("foreign parameter order and single DATE decode via PTYPE") {
    // PCOUNT=5: BASELINE, WW, UU, VV, DATE — one DATE param whose
    // epoch rides in PZERO5 (the third-party convention: a bare f32
    // cannot resolve seconds at a GPS-scale day number)
    val nChans = 2
    val gps = graft.model.Obs.GpsStart.toDouble
    val epochDays = math.floor(gps / 86400.0)
    val cards = Seq(
      card("SIMPLE", "T"), card("BITPIX", "-32"), card("NAXIS", "6"),
      card("NAXIS1", "0"), card("NAXIS2", "3"), card("NAXIS3", "4"),
      card("NAXIS4", nChans.toString), card("NAXIS5", "1"),
      card("NAXIS6", "1"), card("GROUPS", "T"), card("PCOUNT", "5"),
      card("GCOUNT", "1"),
      card("PTYPE1", "'BASELINE'"), card("PTYPE2", "'WW      '"),
      card("PTYPE3", "'UU      '"), card("PTYPE4", "'VV      '"),
      card("PTYPE5", "'DATE    '"),
      card("PZERO5", epochDays.toString),
      "END".padTo(80, ' ')).mkString
    val header = (cards + " " * ((2880 - cards.length % 2880) % 2880))
      .getBytes("ASCII")

    val groupFloats = 5 + nChans * 12
    val buf = ByteBuffer.allocate(groupFloats * 4) // big-endian
    // ant1=2, ant2=5 -> baseline code 256*3 + 6
    buf.putFloat((256 * 3 + 6).toFloat)
    buf.putFloat(3e-7f) // WW
    buf.putFloat(1e-7f) // UU
    buf.putFloat(2e-7f) // VV
    // single DATE raw = day fraction past the PZERO epoch: centroid of
    // output window 1 (t_out=1 at 4 s steps -> gps + 6 s)
    buf.putFloat(((gps + 6.0 - epochDays * 86400.0) / 86400.0).toFloat)
    (0 until nChans * 12).foreach(i => buf.putFloat(i.toFloat))
    val data = buf.array()
    val pad = new Array[Byte]((2880 - data.length % 2880) % 2880)

    val dir = Files.createTempDirectory("uvf_foreign")
    val path = dir.resolve("foreign.uvfits")
    Files.write(path, header ++ data ++ pad)

    val rows = graft.sources.UvfitsReader
      .read(spark, path.toString, nAnts = 8).collect()
    assert(rows.length == nChans)
    val r = rows.sortBy(_.getLong(4)).head
    assert(r.getLong(0) == 1L, "t_out from the single DATE param")
    assert(r.getLong(2) == 2L && r.getLong(3) == 5L,
      "antennas from the relocated BASELINE param")
    // UVW located by PTYPE despite the foreign order (f32-exact)
    assert(r.getAs[Double]("u_s") == 1e-7f.toDouble)
    assert(r.getAs[Double]("v_s") == 2e-7f.toDouble)
    assert(r.getAs[Double]("w_s") == 3e-7f.toDouble)
    // payload: file pol order XX YY XY YX -> XX re of chan 0 is
    // float 0, weight (3rd of XX triplet) is float 2
    assert(r.getAs[Double]("a0") == 0.0)
    assert(r.getAs[Double]("weight_out") == 2.0)
  }
}
