package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mwaf round trip with NON-default container constants: a 4-antenna,
  * 3-scan, 4-fine-chan observation must produce files whose header
  * drives the read-back — proving both sides take their geometry from
  * the metadata seam, not the synthetic defaults.
  */
class MwafForeignSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private object TinyMeta extends graft.model.MetaSource {
    override def nAnts: Int = 4
    override def nScans: Int = 3
    override def fineChansPerCoarse: Int = 4
    override def gpsStartS: Double = 999.0
    def timestep(s: SparkSession): DataFrame = {
      import s.implicits._
      (0L until 3L).map(t => (t, 999L + t, false))
        .toDF("t", "gps_s", "ts_flag")
    }
    def baseline(s: SparkSession): DataFrame = {
      import s.implicits._
      (for (a1 <- 0 until 4; a2 <- a1 until 4)
        yield ((a1 * 4 + a2).toLong, a1.toLong, a2.toLong, false))
        .toDF("bl", "ant1", "ant2", "bl_flag")
    }
    def antenna(s: SparkSession): DataFrame = sys.error("unused")
    // no antenna dim: the writer must fall back to TileNNN names
    // derived from nAnts alone — mwaf needs only timestep/baseline
    override def antennaOpt(s: SparkSession): Option[DataFrame] = None
    def chan(s: SparkSession): DataFrame = sys.error("unused")
    def digitalGain(s: SparkSession): DataFrame = sys.error("unused")
    def flaggedAnts(s: SparkSession): Seq[Long] = Nil
  }

  test("4-antenna container round-trips through seam-driven files") {
    import spark.implicits._
    // sparse flagged frame: one cc, only (t=0, bl=0) present with
    // fc 1 and 3 flagged — everything absent must read back fully
    // flagged (dense missing-cell semantics)
    val vis = Seq(
      (0L, 0L, 0L, 1L, true), (0L, 0L, 0L, 3L, true),
      (0L, 0L, 0L, 0L, false), (0L, 0L, 0L, 2L, false))
      .toDF("cc", "t", "bl", "fc", "flag")

    val dir = Files.createTempDirectory("mwaf_foreign").toString
    val counts = graft.sinks.MwafWriter.write(vis, dir,
      meta = TinyMeta)
    assert(counts == Map(0L -> 30L)) // 3 scans x 10 baselines

    val back = graft.sources.MwafReader.read(spark, dir)
    assert(back.count() == 30)
    // the present cell carries exactly bits 1 and 3 (one word at the
    // 4-chan width)
    val present = back.where(col("t") === 0 && col("bl") === 0)
      .select("flag_words", "n_chans").head()
    assert(present.getSeq[Long](0) == Seq(((1 << 1) | (1 << 3)).toLong))
    assert(present.getLong(1) == 4L, "NCHANS from the file header")
    // every absent cell is fully flagged at the 4-chan width
    assert(back.where(!(col("t") === 0 && col("bl") === 0))
      .where(element_at(col("flag_words"), 1) =!= 15L).count() == 0)
    // baseline ids enumerate the 4-antenna grid, not the default 8
    val bls = back.select("bl").distinct().as[Long].collect().sorted
    assert(bls.toSeq == graft.sources.MwafReader.baselineIds(4).toSeq)
    // the TILES provenance fell back to the TileNNN convention
    val conf = spark.sparkContext.hadoopConfiguration
    val tiles = graft.sources.MwafReader
      .readTiles(s"$dir/flags_0.mwaf", conf)
    assert(tiles.toSeq ==
      (0 until 4).map(a => (a, f"Tile$a%03d")))
  }

  test("TILES carries real tile names when the antenna dim has them") {
    import spark.implicits._
    val named = new graft.model.MetaSource {
      override def nAnts: Int = 4
      override def nScans: Int = 3
      override def fineChansPerCoarse: Int = 4
      override def gpsStartS: Double = 999.0
      def timestep(s: SparkSession): DataFrame = TinyMeta.timestep(s)
      def baseline(s: SparkSession): DataFrame = TinyMeta.baseline(s)
      def antenna(s: SparkSession): DataFrame = {
        import s.implicits._
        Seq((0L, "HexE001"), (1L, "HexE002"), (2L, "LBA4"),
          (3L, "LBG7")).toDF("ant", "tile_name")
      }
      def chan(s: SparkSession): DataFrame = sys.error("unused")
      def digitalGain(s: SparkSession): DataFrame = sys.error("unused")
      def flaggedAnts(s: SparkSession): Seq[Long] = Nil
    }
    val vis = Seq((0L, 0L, 0L, 1L, true))
      .toDF("cc", "t", "bl", "fc", "flag")
    val dir = Files.createTempDirectory("mwaf_named").toString
    graft.sinks.MwafWriter.write(vis, dir, meta = named)
    val conf = spark.sparkContext.hadoopConfiguration
    val tiles = graft.sources.MwafReader
      .readTiles(s"$dir/flags_0.mwaf", conf)
    assert(tiles.toSeq == Seq((0, "HexE001"), (1, "HexE002"),
      (2, "LBA4"), (3, "LBG7")))
  }
}
