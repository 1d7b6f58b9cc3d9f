package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The CLI surface: argument parsing (loud failures, as the reference's
  * clap CLI), metafits-driven auto-skip decisions
  * (/root/reference/src/cli.rs:1389-1399, 1444-1452), and an
  * end-to-end fixture-metafits → uvfits run.
  */
class CliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parse: reference-style args land in the config") {
    val cfg = Cli.parse(Seq("-d", "/data", "-m", "obs.metafits",
      "-u", "out.uvfits", "--sel-time", "2", "11", "--sel-ants", "0,1,3",
      "--no-autos", "--avg-time", "4", "--avg-freq", "2",
      "--flag-edge-chans", "2", "--no-cable-delay")).toOption.get
    assert(cfg.dataDir == "/data")
    assert(cfg.metafits.contains("obs.metafits"))
    assert(cfg.uvfitsOut.contains("out.uvfits"))
    assert(cfg.selTime.contains((2L, 11L)))
    assert(cfg.selAnts == Seq(0L, 1L, 3L))
    assert(cfg.noAutos && cfg.noCable && !cfg.noGeom)
    assert(cfg.avgTime == 4 && cfg.avgFreq == 2)
    assert(cfg.edgeChans.contains(2))

    val cfg2 = Cli.parse(Seq("-d", "/data", "-M", "out.ms",
      "--flag-strategy", "mwa.strategy", "--aocal", "sol.bin"))
      .toOption.get
    assert(cfg2.msOut.contains("out.ms"))
    assert(cfg2.rfiStrategyFile.contains("mwa.strategy"))
    assert(cfg2.rfi, "rfi flagging defaults ON, as the reference")
    assert(cfg2.aocalFile.contains("sol.bin"))

    // reference default semantics: RFI on unless --no-rfi
    // (cli.rs:810, applied :1455); --rfi stays as a no-op alias
    assert(Cli.parse(Seq("-d", "/data")).toOption.get.rfi)
    assert(!Cli.parse(Seq("-d", "/data", "--no-rfi")).toOption.get.rfi)
    assert(Cli.parse(Seq("-d", "/data", "--rfi")).toOption.get.rfi)
  }

  test("default decisions: no synthetic calibration, auto passband") {
    val d = Cli.decisions(Cli.Config(dataDir = "x"),
      graft.model.SynthDims)
    assert(d.contains("calibrate: skip (no solutions file)"),
      "a run without --aocal must NOT apply synthetic solutions")
    assert(d.exists(_.startsWith("rfi: apply (default strategy)")))
    assert(d.exists(_.contains("passband: apply (auto: CorrMwaxV2")))

    val dNoRfi = Cli.decisions(
      Cli.Config(dataDir = "x", rfi = false), graft.model.SynthDims)
    assert(dNoRfi.contains("rfi: skip (--no-rfi)"))

    // explicit tables and none win over auto
    val dNone = Cli.decisions(
      Cli.Config(dataDir = "x", pfbGains = Some("none")),
      graft.model.SynthDims)
    assert(dNone.contains("passband: skip (--pfb-gains none)"))
    assert(Cli.passbandSelect(
      Cli.Config(dataDir = "x", pfbGains = Some("cotter")),
      graft.model.SynthDims)._2
      .contains((graft.model.PfbTables.CorrLegacy, false)))
    assert(Cli.passbandSelect(
      Cli.Config(dataDir = "x", pfbGains = Some("jake_oversampled")),
      graft.model.SynthDims)._2
      .contains((graft.model.PfbTables.CorrMwaxV2, true)))
  }

  test("metafits correlator keywords drive passband auto-select") {
    val dir = Files.createTempDirectory("cli_corr")
    def meta(name: String, ver: Int, os: Boolean = false,
             dr: Boolean = false) =
      graft.sources.MetafitsMeta(graft.sources.MetafitsReader.read(
        graft.synth.MetafitsSynth.write(dir.resolve(name).toString,
          corrVersion = ver, oversampled = os, deripple = dr)))

    val legacy = meta("legacy.metafits", 1)
    assert(legacy.mwaVersion == graft.model.PfbTables.CorrLegacy)
    assert(Cli.passbandSelect(Cli.Config(dataDir = "x"), legacy)._2
      .contains((graft.model.PfbTables.CorrLegacy, false)))

    val mwaxOs = meta("mwax_os.metafits", 2, os = true)
    assert(Cli.passbandSelect(Cli.Config(dataDir = "x"), mwaxOs)._2
      .contains((graft.model.PfbTables.CorrMwaxV2, true)))

    val derippled = meta("dr.metafits", 2, dr = true)
    assert(derippled.derippleApplied)
    assert(Cli.passbandSelect(Cli.Config(dataDir = "x"), derippled)._2
      .isEmpty, "deripple applied disables auto passband")

    // --van-vleck is legacy-only (reference cli.rs:1378-1388)
    val cfgVv = Cli.Config(dataDir = "/root/testdata/sf0.001",
      vanVleck = true)
    val ex = intercept[IllegalArgumentException] {
      Cli.run(spark, cfgVv, _ => ())
    }
    assert(ex.getMessage.contains("legacy correlator"))
  }

  test("parse: malformed input fails loudly") {
    assert(Cli.parse(Seq("-u", "x.uvfits")).isLeft) // missing -d
    assert(Cli.parse(Seq("-d", "/data", "--sel-time", "9", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "/data", "--avg-time", "0")).isLeft)
    assert(Cli.parse(Seq("-d", "/data", "--frobnicate")).isLeft)
    assert(Cli.parse(Seq("-d", "/data", "--sel-ants", "1,x")).isLeft)
  }

  test("auto-skip: metafits CABLEDEL/GEODEL drive the stage decisions") {
    val dir = Files.createTempDirectory("cli_meta")
    val applied = graft.synth.MetafitsSynth.write(
      dir.resolve("applied.metafits").toString,
      cableApplied = true, geometryApplied = true)
    val fresh = graft.synth.MetafitsSynth.write(
      dir.resolve("fresh.metafits").toString)

    val mApplied = graft.sources.MetafitsMeta(
      graft.sources.MetafitsReader.read(applied))
    val mFresh = graft.sources.MetafitsMeta(
      graft.sources.MetafitsReader.read(fresh))

    val dApplied = Cli.decisions(Cli.Config(dataDir = "x"), mApplied)
    assert(dApplied.exists(_.contains("cable: skip (metafits CABLEDEL")))
    assert(dApplied.exists(_.contains("geometry: skip (metafits GEODEL")))

    val dFresh = Cli.decisions(Cli.Config(dataDir = "x"), mFresh)
    assert(dFresh.contains("cable: apply"))
    assert(dFresh.contains("geometry: apply"))

    // Van Vleck sample scale from the container: 40 kHz x 2 s x 2 x
    // bscale 0.5 = 80000 (reference get_vv_sample_scale worked example)
    assert(mFresh.vvSampleScale() == 80000.0)
    val dVv = Cli.decisions(
      Cli.Config(dataDir = "x", vanVleck = true), mFresh)
    assert(dVv.exists(_.contains("sample scale 80000.0")))

    // explicit flags win over a fresh container
    val dFlag = Cli.decisions(
      Cli.Config(dataDir = "x", noCable = true), mFresh)
    assert(dFlag.contains("cable: skip (--no-cable-delay)"))
  }

  test("end-to-end: fixture metafits to uvfits with decisions logged") {
    val dir = Files.createTempDirectory("cli_e2e")
    val metafits = graft.synth.MetafitsSynth.write(
      dir.resolve("obs.metafits").toString)
    val out = dir.resolve("out.uvfits").toString
    val msOut = dir.resolve("out.ms").toString
    val strategyFile = dir.resolve("mwa.strategy")
    Files.writeString(strategyFile, "mad_k = 5.0\npols = yy\n")
    val aocal = dir.resolve("sol.bin").toString
    graft.sources.AOCalReader.write(aocal,
      graft.sources.AOCalReader.AOCalSols(1, 8, 4, None, None,
        Array.tabulate(1, 8, 4)((_, tile, ch) =>
          Array.tabulate(8)(k =>
            if (k == 0 || k == 6) 1.0 + tile * 0.015625 + ch * 0.03125
            else 0.0))))

    val cfg = Cli.parse(Seq(
      "-d", "/root/testdata/sf0.001", "-m", metafits, "-u", out,
      "-M", msOut, "--flag-strategy", strategyFile.toString,
      "--aocal", aocal,
      "--sel-time", "0", "15", "--avg-time", "2", "--avg-freq", "2"))
      .toOption.get

    val logged = scala.collection.mutable.ArrayBuffer[String]()
    val n = Cli.run(spark, cfg, logged += _)
    assert(n > 0, "uvfits groups written")
    assert(Files.exists(Paths.get(out)))
    assert(Files.size(Paths.get(out)) % 2880 == 0, "FITS block aligned")
    assert(logged.exists(_.contains("cable: apply")))
    assert(logged.exists(_.contains("geometry: apply")))
    assert(logged.exists(_.contains("rfi: apply (strategy file")))
    assert(logged.exists(_.contains("calibrate: apply (MWAOCAL")))
    assert(logged.exists(_.contains(s"wrote $n uvfits groups")))

    // the MS container landed beside the uvfits and parses back
    val msRows = graft.sinks.MsContainer.readTable(msOut,
      spark.sparkContext.hadoopConfiguration).nRows
    assert(msRows == n, "MS MAIN rows == uvfits groups (same frame)")

    // the written file carries non-zero UVW group params (real writer,
    // not the structure-only path)
    import org.apache.spark.sql.functions.col
    val back = graft.sources.UvfitsReader.read(spark, out, nAnts = 8)
    assert(back.where(col("u_s") =!= 0.0 || col("v_s") =!= 0.0 ||
      col("w_s") =!= 0.0).count() > 0)
  }

  test("edge-chan override reshapes the static channel flags") {
    val meta = graft.model.MetaDecorators.EdgeFlag(graft.model.SynthDims, 2)
    import org.apache.spark.sql.functions.col
    val flagged = meta.chan(spark).where(col("ch_flag"))
      .select("fc").distinct().collect().map(_.getLong(0)).sorted
    // width-2 edges on fpc=8: fc 0,1,6,7 plus DC fc=4
    assert(flagged.toSeq == Seq(0L, 1L, 4L, 6L, 7L))
  }

  test("ad-hoc flag decorators stack over any metadata seam") {
    import org.apache.spark.sql.functions.col
    val cfg = Cli.parse(Seq("-d", "/data", "--flag-times", "5,9",
      "--flag-antennas", "2", "--quack-time", "6.0")).toOption.get
    assert(cfg.flagTimes == Seq(5L, 9L) && cfg.flagAnts == Seq(2L))
    assert(cfg.quackTime.contains(6.0))

    val meta = Cli.decorate(graft.model.SynthDims, cfg)
    // quack 6 s at 2 s int-time flags t 0..2; --flag-times adds 5 and
    // 9; the synthetic seam's own flags (t=0, t=15) stay
    val ts = meta.timestep(spark).where(col("ts_flag"))
      .select("t").collect().map(_.getLong(0)).sorted
    assert(ts.toSeq == Seq(0L, 1L, 2L, 5L, 9L, 15L))
    // antenna 2 joins the metafits-flagged antenna 7 everywhere
    assert(meta.flaggedAnts(spark) == Seq(2L, 7L))
    val blFlagged = meta.baseline(spark)
      .where(col("bl_flag")).select("ant1", "ant2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(blFlagged.forall { case (a1, a2) =>
      a1 == 2 || a2 == 2 || a1 == 7 || a2 == 7 })
    assert(blFlagged.length == 15) // 8 touching ant2 + 8 ant7 - shared
    // malformed values fail loudly
    assert(Cli.parse(Seq("-d", "x", "--flag-times", "1,b")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--quack-time", "-1")).isLeft)
  }

  test("gpubox FITS + metafits: the reference's primary input path") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("cli_gbx")
    val gbx = dir.resolve("vis").toString
    Files.createDirectories(dir.resolve("vis"))
    // 2 coarse channels, cc 0 missing 4 of its 16 announced scans
    graft.sources.FitsGpubox.writeFixture(
      s"$gbx/gpubox00.fits", 0, 16, 8, 8, 12)
    graft.sources.FitsGpubox.writeFixture(
      s"$gbx/gpubox01.fits", 1, 16, 8, 8, 16)
    val metafits = graft.synth.MetafitsSynth.write(
      dir.resolve("obs.metafits").toString)
    val out = dir.resolve("raw.uvfits").toString

    val cfg = Cli.parse(Seq("--gpubox", gbx, "-m", metafits,
      "-u", out, "--no-geometric-delay")).toOption.get
    val logged = scala.collection.mutable.ArrayBuffer[String]()
    val n = Cli.run(spark, cfg, logged += _)
    assert(n > 0)
    assert(logged.exists(_.contains("reading gpubox FITS")))

    // the missing slabs (cc 0 = c_out 0..3 after 2x freq averaging,
    // t >= 12 = t_out 6..7) must survive ingest -> static flag OR ->
    // weights -> averaging as fully-flagged cells: zero weight in the
    // file, while cc 1 (complete) keeps positive weights there
    val back = graft.sources.UvfitsReader.read(spark, out, nAnts = 8)
    val missing = back.where(col("t_out") >= 6 && col("c_out") < 4)
    assert(missing.count() > 0)
    assert(missing.where(col("weight_out") > 0).count() == 0,
      "missing-HDU cells must stay flagged through the pipeline")
    assert(back.where(col("t_out") === 6 && col("c_out") >= 4 &&
      col("weight_out") > 0).count() > 0,
      "complete coarse channel keeps unflagged cells at the same times")
  }

  test("legacy 10 kHz end-to-end: 128-fine-chan gpubox through the " +
    "CLI to a multi-word mwaf write and MwafReader round trip") {
    import org.apache.spark.sql.functions.{col, expr}
    // the reference's own legacy class (obs 1196175296_mwa_ord: 128
    // fine chans per coarse at 10 kHz, CORR_VER 1 —
    // /root/reference/src/io/mwaf.rs:434-439) through entry point 1:
    // gpubox -> corrections -> mwaf write -> read-back
    val dir = Files.createTempDirectory("cli_legacy")
    val gbx = dir.resolve("vis").toString
    Files.createDirectories(dir.resolve("vis"))
    graft.sources.FitsGpubox.writeFixture(
      s"$gbx/gpubox00.fits", 0, 16, 8, 128, 16)
    graft.sources.FitsGpubox.writeFixture(
      s"$gbx/gpubox01.fits", 1, 16, 8, 128, 16)
    val metafits = graft.synth.MetafitsSynth.write(
      dir.resolve("obs.metafits").toString,
      corrVersion = 1,
      fineChanWidthHz = 10000.0,
      nChans = 128 * graft.model.Obs.NumCoarse)
    val flagDir = dir.resolve("flags").toString
    Files.createDirectories(dir.resolve("flags"))

    val cfg = Cli.parse(Seq("--gpubox", gbx, "-m", metafits,
      "--flag-out", flagDir, "--no-geometric-delay")).toOption.get
    val logged = scala.collection.mutable.ArrayBuffer[String]()
    val n = Cli.run(spark, cfg, logged += _)
    assert(n > 0)
    assert(logged.exists(_.contains("writing mwaf flags")))

    val back = graft.sources.MwafReader.read(spark, flagDir)
    // the legacy width survives the container loop: 128 fine chans =
    // FOUR 32-bit FLAGS words per (t, bl) row (Sinks.MwafWordChans),
    // NCHANS header intact
    assert(back.select("n_chans").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(128L))
    assert(back.selectExpr("size(flag_words) AS w").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(4))
    // both gpubox coarse channels produced a file
    assert(back.select("cc").distinct().count() == 2)
    // the 80 kHz default edge width = 8 fine chans per side at
    // 10 kHz, so channels 120..127 are statically flagged — bits
    // that only exist in the LAST flag word (a <=64-chan bitmask
    // would have silently truncated them)
    assert(back.where(expr("flag_words[3] != 0")).count() ===
      back.count(), "top-edge static flags must land in word 3 on " +
      "every row")
    // and the first word carries the bottom-edge flags
    assert(back.where(expr("flag_words[0] != 0")).count() ===
      back.count())
  }

  test("channel flag decorators, resolutions, pfb and phase centre") {
    import org.apache.spark.sql.functions.col
    val cfg = Cli.parse(Seq("-d", "/data",
      "--flag-coarse-chans", "2", "--flag-fine-chans", "3",
      "--no-flag-dc", "--flag-init-steps", "2", "--flag-end-steps", "3",
      "--avg-time-res", "8.0", "--avg-freq-res", "120",
      "--pfb-gains", "cotter", "--phase-centre", "15.0", "-30.0",
      "--sel-chan-ranges", "0-1, 3", "--no-sel-flagged-ants"))
      .toOption.get
    assert(cfg.flagCoarseChans == Seq(2L) && cfg.flagFineChans == Seq(3L))
    assert(cfg.noFlagDc && cfg.noFlaggedAnts)
    assert(cfg.flagInitSteps.contains(2) && cfg.flagEndSteps.contains(3))
    assert(cfg.pfbGains.contains("cotter"))
    assert(cfg.phaseCentreDeg.contains((15.0, -30.0)))
    assert(cfg.selChanRanges.contains("0-1, 3"))

    // resolutions quantise to the container grid: 8 s at 2 s int-time
    // = factor 4; 120 kHz at 40 kHz fine channels = factor 3
    val (at, af) = Cli.avgFactors(cfg, graft.model.SynthDims)
    assert(at == 4 && af == 3)

    val meta = Cli.decorate(graft.model.SynthDims, cfg)
    // chan flags: coarse 2 fully flagged, fc=3 everywhere, DC (fc=4)
    // cleared, edges (fc 0,7) kept
    val flagged = meta.chan(spark).where(col("ch_flag"))
      .select("cc", "fc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 8).forall(fc => flagged((2L, fc.toLong))))
    assert((0 until 4).forall(cc => flagged((cc.toLong, 3L))))
    assert(!flagged((0L, 4L)), "DC bin cleared by --no-flag-dc")
    assert(flagged((0L, 0L)) && flagged((0L, 7L)))
    // timestep flags: first 2 + last 3 of 16 (plus the seam's own 0/15)
    val ts = meta.timestep(spark).where(col("ts_flag"))
      .select("t").collect().map(_.getLong(0)).sorted
    assert(ts.toSeq == Seq(0L, 1L, 13L, 14L, 15L))

    // malformed values fail loudly
    assert(Cli.parse(Seq("-d", "x", "--pfb-gains", "bogus")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--phase-centre", "1.0")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--avg-time-res", "0")).isLeft)
  }

  test("pointing/cotter/chunking/edge-width flag vocabulary") {
    import org.apache.spark.sql.functions.col
    val cfg = Cli.parse(Seq("-d", "/data", "--pointing-centre",
      "--emulate-cotter", "--flag-edge-width", "120", "--flag-autos",
      "--no-flag-metafits", "--time-chunk", "4")).toOption.get
    assert(cfg.pointingCentre && cfg.emulateCotter && cfg.flagAutos)
    assert(cfg.noFlagMetafits && cfg.timeChunk.contains(4))
    assert(cfg.flagEdgeWidthKhz.contains(120.0))

    // clap-style conflicts (reference cli.rs:748-749, 681)
    assert(Cli.parse(Seq("-d", "x", "--pointing-centre",
      "--phase-centre", "1", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--time-chunk", "4",
      "--max-memory", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--flag-edge-width", "80",
      "--flag-edge-chans", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "x", "--max-memory", "0")).isLeft)

    // 120 kHz at 40 kHz fine channels = 3 edge chans on each side
    val m = Cli.decorate(graft.model.SynthDims, cfg)
    val flagged = m.chan(spark).where(col("ch_flag"))
      .select("fc").distinct().collect().map(_.getLong(0)).sorted
    assert(flagged.toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L))
    // --flag-autos flags every auto baseline; --no-flag-metafits
    // cleared the container's ant-7 flags first
    assert(m.flaggedAnts(spark).isEmpty)
    val blFlagged = m.baseline(spark).where(col("bl_flag"))
      .select("ant1", "ant2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(blFlagged.length == 8)
    assert(blFlagged.forall { case (a1, a2) => a1 == a2 })

    // a non-multiple edge width fails loudly (reference cli.rs:1079)
    val bad = Cli.parse(Seq("-d", "x", "--flag-edge-width", "50"))
      .toOption.get
    val ex = intercept[IllegalArgumentException] {
      Cli.decorate(graft.model.SynthDims, bad)
    }
    assert(ex.getMessage.contains("not a multiple"))

    // --time-chunk must be a multiple of the averaging factor
    val cfgChunk = Cli.parse(Seq("-d", "/root/testdata/sf0.001",
      "--time-chunk", "3", "--avg-time", "2", "--no-rfi")).toOption.get
    val ex2 = intercept[IllegalArgumentException] {
      Cli.run(spark, cfgChunk, _ => ())
    }
    assert(ex2.getMessage.contains("multiple of the temporal"))

    // decision lines surface the centre + array-position choices
    val meta = graft.sources.MetafitsMeta(graft.sources.MetafitsReader
      .read(graft.synth.MetafitsSynth.write(
        Files.createTempDirectory("cli_pt").resolve("p.metafits")
          .toString,
        pointingDeg = Some((30.0, -20.0)))))
    val d = Cli.decisions(
      Cli.Config(dataDir = "x", pointingCentre = true,
        emulateCotter = true), meta)
    assert(d.contains("phase centre: tile pointing (--pointing-centre)"))
    assert(d.contains("array position: cotter emulation " +
      "(--emulate-cotter)"))
    assert(Cli.effectivePhaseCentre(
      Cli.Config(dataDir = "x", pointingCentre = true), meta)
      .contains((math.toRadians(30.0), math.toRadians(-20.0))))
    // container phase centre is the default source when present
    assert(Cli.effectivePhaseCentre(Cli.Config(dataDir = "x"), meta)
      .contains((math.toRadians(30.0), math.toRadians(-20.0))))
    // explicit --phase-centre wins
    assert(Cli.effectivePhaseCentre(
      Cli.Config(dataDir = "x", phaseCentreDeg = Some((15.0, -30.0))),
      meta).contains((math.toRadians(15.0), math.toRadians(-30.0))))
  }

  test("decorators preserve the inner container's scalar constants") {
    import org.apache.spark.sql.functions.col
    // a seam with non-default constants: decorators must DELEGATE
    // every scalar, not revert to the synthetic defaults
    val base = new graft.model.MetaSource {
      def antenna(s: org.apache.spark.sql.SparkSession) =
        graft.model.Dims.antenna(s)
      def timestep(s: org.apache.spark.sql.SparkSession) =
        graft.model.Dims.timestep(s)
      def chan(s: org.apache.spark.sql.SparkSession) =
        graft.model.Dims.chan(s)
      def baseline(s: org.apache.spark.sql.SparkSession) =
        graft.model.Dims.baseline(s)
      def digitalGain(s: org.apache.spark.sql.SparkSession) =
        graft.model.Dims.digitalGain(s)
      def flaggedAnts(s: org.apache.spark.sql.SparkSession) = Seq(7L)
      override def nAnts: Int = 128
      override def fineChanWidthHz: Double = 10000.0
      override def intTimeS: Double = 0.5
      override def nChans: Int = 3072
      override def nScans: Int = 240
      override def gpsStartS: Double = 1.4e9
      override def baseFreqHz: Double = 1.8e8
    }
    val cfg = Cli.parse(Seq("-d", "/data", "--quack-time", "4",
      "--flag-edge-chans", "1", "--flag-antennas", "3")).toOption.get
    val m = Cli.decorate(base, cfg)
    assert(m.nAnts == 128)
    assert(m.fineChanWidthHz == 10000.0 && m.intTimeS == 0.5)
    assert(m.nChans == 3072 && m.nScans == 240)
    assert(m.gpsStartS == 1.4e9 && m.baseFreqHz == 1.8e8)
    assert(m.vvSampleScale() == 10000.0 * 0.5 * 2.0 * 0.5)

    // --no-flag-dc composed with --flag-edge-chans: the edge rederive
    // must not resurrect the DC flag
    val cfg2 = Cli.parse(Seq("-d", "/data", "--flag-edge-chans", "1",
      "--no-flag-dc")).toOption.get
    val m2 = Cli.decorate(graft.model.SynthDims, cfg2)
    val fcs = m2.chan(spark).where(col("ch_flag"))
      .select("fc").distinct().collect().map(_.getLong(0)).sorted
    assert(fcs.toSeq == Seq(0L, 7L), s"DC must stay clear, got $fcs")
  }

  test("reference long-name synonyms and --opt=value both parse") {
    val cfg = Cli.parse(Seq("--metafits", "obs.metafits",
      "--uvfits-out=out.uvfits", "--ms-out", "out.ms",
      "--passband-gains", "cotter", "--apply-di-cal=sol.bin",
      "--avg-time-factor", "4", "--avg-freq-factor=2",
      "--aoflagger-strategy", "mwa.lua", "--no-sel-autos",
      "-d", "/data")).toOption.get
    assert(cfg.metafits.contains("obs.metafits"))
    assert(cfg.uvfitsOut.contains("out.uvfits"))
    assert(cfg.msOut.contains("out.ms"))
    assert(cfg.pfbGains.contains("cotter"))
    assert(cfg.aocalFile.contains("sol.bin"))
    assert(cfg.avgTime == 4 && cfg.avgFreq == 2)
    assert(cfg.rfiStrategyFile.contains("mwa.lua"))
    assert(cfg.noAutos)
  }

  test("positional gpubox paths: one directory required") {
    val cfg = Cli.parse(Seq("-m", "obs.metafits",
      "/obs/gpubox01_00.fits", "/obs/gpubox02_00.fits")).toOption.get
    assert(cfg.gpuboxDir.contains("/obs"))
    assert(cfg.fitsFiles.length == 2)
    val bad = Cli.parse(Seq("-m", "m.fits",
      "/a/gpubox01.fits", "/b/gpubox02.fits"))
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("span directories"))
  }

  test("flag-template parses dir + %% template; %% is required") {
    val cfg = Cli.parse(Seq("-d", "/data",
      "-f", "/out/FlagfileMWA_%%.mwaf")).toOption.get
    assert(cfg.mwafOut.contains("/out"))
    assert(cfg.mwafTemplate == "FlagfileMWA_%%.mwaf")
    assert(Cli.parse(Seq("-d", "/data",
      "--flag-template", "/out/flags.mwaf")).isLeft)
  }

  test("flag-init/--flag-end seconds: grid-validated, conflicts " +
    "with the steps variants; --flag-dc forces the DC flag") {
    import org.apache.spark.sql.functions.col
    val cfg = Cli.parse(Seq("-d", "/data", "--flag-init", "4",
      "--flag-end", "2")).toOption.get
    // SynthDims intTimeS = 2.0 -> 2 and 1 steps
    val m = Cli.decorate(graft.model.SynthDims, cfg)
    val flagged = m.timestep(spark).where(col("ts_flag"))
      .select("t").collect().map(_.getLong(0)).toSet
    val n = graft.model.SynthDims.nScans
    assert(flagged.contains(0L) && flagged.contains(1L),
      "first 4 s = 2 steps quacked")
    assert(flagged.contains(n - 1L), "last 2 s = 1 step flagged")
    // non-multiple seconds fail loudly, as the reference
    val badCfg = Cli.parse(Seq("-d", "/data", "--flag-init", "3"))
      .toOption.get
    assertThrows[IllegalArgumentException](
      Cli.decorate(graft.model.SynthDims, badCfg))
    assert(Cli.parse(Seq("-d", "/data", "--flag-init", "4",
      "--flag-init-steps", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "/data", "--flag-end", "4",
      "--flag-end-steps", "2")).isLeft)
    assert(Cli.parse(Seq("-d", "/data", "--flag-dc", "--no-flag-dc"))
      .isLeft)
    // --flag-dc forces the centre channel on over a cleared default
    val dcCfg = Cli.parse(Seq("-d", "/data", "--flag-dc")).toOption.get
    val dcM = Cli.decorate(graft.model.SynthDims, dcCfg)
    val fpc = graft.model.SynthDims.fineChansPerCoarse
    assert(dcM.chan(spark).where(col("fc") === fpc / 2)
      .select("ch_flag").collect().forall(_.getBoolean(0)))
  }

  test("a .lua strategy file routes through the AOFlagger translator " +
    "and reports untranslated calls") {
    val dir = java.nio.file.Files.createTempDirectory("cli_lua")
    val lua = dir.resolve("mwa.lua")
    java.nio.file.Files.writeString(lua,
      """function execute(input)
        |  local base_threshold = 1.0
        |  aoflagger.sumthreshold(data, 1.0, 1.0, true, true)
        |  aoflagger.visualize(data, "stage", 0)
        |end""".stripMargin)
    val out = dir.resolve("out.uvfits").toString
    val cfg = Cli.parse(Seq("-d", "/root/testdata/sf0.001", "-u", out,
      "--flag-strategy", lua.toString,
      "--sel-time", "0", "7", "--avg-time", "2", "--avg-freq", "2"))
      .toOption.get
    val logged = scala.collection.mutable.ArrayBuffer[String]()
    val n = Cli.run(spark, cfg, logged += _)
    assert(n > 0)
    assert(logged.exists(_.contains("lua strategy call NOT translated")
      ), s"expected unmapped report in ${logged.filter(_.contains("rfi"))}")
    assert(logged.exists(_.contains("visualize")))
  }

  test("dry-run prints the summary and runs nothing") {
    var logs = Vector.empty[String]
    val cfg = Cli.parse(Seq("-d", "/does/not/exist", "--dry-run",
      "--no-draw-progress", "--provided-chan-ranges")).toOption.get
    // dataDir does not exist: only a dry run can return without error
    val n = Cli.run(spark, cfg, s => logs :+= s)
    assert(n == 0L)
    assert(logs.exists(_.contains("dry run:")))
    assert(logs.exists(_.contains("calibrate: skip")))
  }
}
