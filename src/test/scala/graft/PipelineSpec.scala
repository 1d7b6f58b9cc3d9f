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

  test("external bandpass (strategy apply_bandpass): loads, routes " +
    "through the passband stage, and refuses double-application") {
    val nFine = graft.model.Obs.FineChansPerCoarse
    val dir = java.nio.file.Files.createTempDirectory("bp")
    val f = dir.resolve("bandpass.txt")
    java.nio.file.Files.writeString(f,
      (0 until nFine).map(i => s"${1.0 + 0.01 * i} # fc $i")
        .mkString("\n"))
    // the guard: a pipeline already applying built-in PFB gains must
    // refuse the strategy's external table — double-correction
    intercept[IllegalArgumentException](
      PassbandGains.external(spark, f.toString, nFine,
        pipelineAppliesPfb = true))
    // wrong-sized and non-positive tables fail loudly
    val bad = dir.resolve("short.txt")
    java.nio.file.Files.writeString(bad, "1.0\n2.0")
    intercept[IllegalArgumentException](
      PassbandGains.external(spark, bad.toString, nFine,
        pipelineAppliesPfb = false))
    val neg = dir.resolve("neg.txt")
    java.nio.file.Files.writeString(neg,
      (0 until nFine).map(i => if (i == 3) "-1.0" else "1.0")
        .mkString("\n"))
    intercept[IllegalArgumentException](
      PassbandGains.external(spark, neg.toString, nFine,
        pipelineAppliesPfb = false))
    // routed through Preprocess: the external gains must actually
    // divide the visibilities relative to the no-passband run
    val ext = PassbandGains.external(spark, f.toString, nFine,
      pipelineAppliesPfb = false)
    val withExt = Preprocess(pfbExternal = Some(ext))(spark, weighted)
    val without = Preprocess(passband = false)(spark, weighted)
    val diff = withExt.select("t", "bl", "chan", "v0").as("a")
      .join(without.select("t", "bl", "chan", "v0").as("b"),
        Seq("t", "bl", "chan"))
      .where(col("a.v0") =!= col("b.v0"))
    assert(diff.count() > 0)
  }

  test("strategy apply_bandpass (rfiBandpass): detection-only — " +
    "flags change, output data and weights do not") {
    val nFine = graft.model.Obs.FineChansPerCoarse
    val dir = java.nio.file.Files.createTempDirectory("bpdet")
    val f = dir.resolve("bandpass.txt")
    // a tiny gain on one fine channel: dividing the DETECTION copy by
    // it amplifies that channel's amplitude x20 -> SumThreshold flags
    // the line, while the returned frame keeps the original numbers
    java.nio.file.Files.writeString(f,
      (0 until nFine).map(i => if (i == 5) "0.05" else "1.0")
        .mkString("\n"))
    val ext = PassbandGains.external(spark, f.toString, nFine,
      pipelineAppliesPfb = false)
    val base = Preprocess(passband = false, rfi = true,
      calibrate = false)
    val withBp = base.copy(rfiBandpass = Some(ext))(spark, weighted)
    val without = base(spark, weighted)
    // reference RunExisting semantics: only the flag mask propagates —
    // the DATA+WEIGHT multiset must be identical, the flag multiset not
    val dataCols = Seq("t", "bl", "chan") ++
      (0 until 8).map(k => s"v$k") :+ "weight"
    val aData = withBp.select(dataCols.map(col): _*)
    val bData = without.select(dataCols.map(col): _*)
    assert(aData.exceptAll(bData).count() == 0 &&
      bData.exceptAll(aData).count() == 0,
      "detection bandpass must not touch output data or weights")
    val aFlag = withBp.select(col("t"), col("bl"), col("chan"),
      col("flag"))
    val bFlag = without.select(col("t"), col("bl"), col("chan"),
      col("flag"))
    assert(aFlag.exceptAll(bFlag).count() > 0,
      "detection bandpass must change the flag mask on fc=5")
  }
}
