package graft

import graft.model.Dims
import graft.ops._
import graft.synth.VisSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline invariants from FIXTURES.md §3 / the reference's golden
  * tests: flag/weight duality, averaging semantics, and the
  * chunked ≡ unchunked contract
  * (/root/reference/src/cli.rs:3312 compare_..._timechunk1).
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  def weighted: DataFrame = {
    val vis = VisSynth.vis(spark, dir)
    WeightOps.flagToWeight(FlagOps.setFlags(vis, Dims.timestep(spark),
      Dims.chan(spark), Dims.baseline(spark)))
  }

  test("flag/weight duality: weight < 0 iff flag") {
    val bad = weighted
      .where((col("weight") < 0) =!= col("flag")).count()
    assert(bad == 0)
  }

  test("averaging: all-flagged groups are flagged with zero weight") {
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val bad = avg.where(col("flag_out") && col("weight_out") =!= 0.0)
      .count()
    assert(bad == 0)
    // and flagged outputs still carry data (plain mean fallback)
    val flagged = avg.where(col("flag_out"))
    assert(flagged.count() > 0)
    assert(flagged.where(col("a0").isNull).count() == 0)
  }

  test("chunked == unchunked: averaging over time chunks equals full run") {
    val full = Averaging.avgTimeFreq(weighted, 2, 2)
    // process in two time chunks (reference --time-chunk), then union:
    // groups never straddle a chunk boundary when chunk size is a
    // multiple of avg_time
    val lo = Averaging.avgTimeFreq(weighted.where(col("t") < 8), 2, 2)
    val hi = Averaging.avgTimeFreq(weighted.where(col("t") >= 8), 2, 2)
    val chunked = lo.unionAll(hi)
    assert(full.count() == chunked.count())
    assert(full.exceptAll(chunked).count() == 0)
    assert(chunked.exceptAll(full).count() == 0)
  }

  test("preprocess composition runs the full stage order") {
    val out = Preprocess(vanVleck = true, rfi = true)(spark, weighted)
    assert(out.count() == 6000)
    assert(out.columns.contains("v0") && out.columns.contains("flag"))
  }

  test("production knobs: published PFB table + apparent geometry") {
    val prod = Preprocess(
      pfbVersion = Some(graft.model.PfbTables.CorrMwaxV2),
      apparentGeometry = true)(spark, weighted)
    assert(prod.count() == 6000)
    // the real gain table and apparent ephemeris must actually change
    // the numbers relative to the synthetic/mean-place defaults
    val dflt = Preprocess()(spark, weighted)
    val diff = prod.select("t", "bl", "chan", "v0").as("a")
      .join(dflt.select("t", "bl", "chan", "v0").as("b"),
        Seq("t", "bl", "chan"))
      .where(org.apache.spark.sql.functions.col("a.v0") =!=
        org.apache.spark.sql.functions.col("b.v0"))
    assert(diff.count() > 0)
  }

  test("entry returns averaged rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
