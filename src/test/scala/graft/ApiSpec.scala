package graft

import java.nio.file.Files

import graft.api.Graft
import graft.ops.Preprocess
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fluent-API walkthrough mirroring the reference's doc example
  * (/root/reference/src/lib.rs:8-84): open → select → flag → weight →
  * preprocess → average → write.
  */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("end-to-end library walkthrough") {
    val out = Files.createTempDirectory("api").toString + "/o.uvfits"
    val frame = Graft(spark)
      .observation("/root/testdata/sf0.001")
      .selectTime(1, 14)
      .withoutAutos()
      .withDefaultFlags()
      .withWeights()
      .preprocess(Preprocess(vanVleck = false, rfi = false))
    val nRows = frame.writeUvfits(out)
    assert(nRows > 0)
    assert(Files.size(java.nio.file.Paths.get(out)) % 2880 == 0)
    // typed edge round-trips the canonical columns
    val typedCount = Graft(spark)
      .observation("/root/testdata/sf0.001").typed.count()
    assert(typedCount == 6000)
  }

  test("picket-fence fan-out writes one output per contiguous cc range") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("ranges").toString
    val frame = Graft(spark).observation("/root/testdata/sf0.001")
    // knock out cc=2 -> ranges (0-1) and (3-3)
    val picket = frame.copy(df = frame.df.where(col("cc") =!= 2))
    val out = picket.writeRanges(base)
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 1L), (3L, 3L)))
    out.foreach { case (_, _, p) =>
      assert(spark.read.parquet(p).count() > 0)
    }
  }

  test("channel range spec: parse, reject, collapse, filter") {
    import graft.ops.ChannelRanges
    assert(ChannelRanges.parse("1-10, 20-30, 40") ==
      Right(Seq((1, 10), (20, 30), (40, 40))))
    assert(ChannelRanges.parse("1-2-3").isLeft)
    assert(ChannelRanges.parse("1-x").isLeft)
    assert(ChannelRanges.fromIdxs(Seq(0, 1, 3, 5, 6)) ==
      Seq((0, 1), (3, 3), (5, 6)))
    val frame = Graft(spark).observation("/root/testdata/sf0.001")
    val ccs = frame.selectChannelRanges("0-1, 3").df
      .select("cc").distinct().collect().map(_.getLong(0)).sorted
    assert(ccs.toSeq == Seq(0L, 1L, 3L))
    assertThrows[IllegalArgumentException] {
      frame.selectChannelRanges("bad-spec")
    }
  }
}
