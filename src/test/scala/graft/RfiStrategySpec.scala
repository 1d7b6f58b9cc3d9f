package graft

import graft.model.Dims
import graft.ops.{FlagOps, RfiFlag, RfiStrategy}
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Strategy-file surface (the reference loads AOFlagger Lua strategies
  * per baseline, flags.rs:406-412): parse, reject typos, and prove two
  * strategies drive the full RFI operator to DIFFERENT occupancies.
  */
class RfiStrategySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parse: keys, comments, defaults for omitted keys") {
    val s = RfiStrategy.parse(
      """# MWA-ish strategy
        |mad_k = 3.0   # aggressive
        |rho = 1.2
        |""".stripMargin)
    assert(s == RfiStrategy(madK = 3.0, maxLog2 = 5, rho = 1.2))
    assert(RfiStrategy.parse("") == RfiStrategy())
  }

  test("parse: unknown keys and malformed lines fail loudly") {
    intercept[RuntimeException](RfiStrategy.parse("madk = 3.0"))
    intercept[RuntimeException](RfiStrategy.parse("just some words"))
    intercept[IllegalArgumentException](RfiStrategy.parse("pols = zz"))
  }

  test("parse: pol selection and direction weights") {
    val s = RfiStrategy.parse(
      "pols = xx, yy\ntime_weight = 2.0\nchan_weight = 0.5")
    assert(s.pols == Seq("xx", "yy"))
    assert(s.timeWeight == 2.0 && s.chanWeight == 0.5)
  }

  test("fromFile round-trips through a real file") {
    val dir = java.nio.file.Files.createTempDirectory("strategy")
    val f = dir.resolve("aggressive.strategy")
    java.nio.file.Files.writeString(f,
      "mad_k = 2.5\nmax_log2 = 3 -- shallow windows\n")
    assert(RfiStrategy.fromFile(f.toString) ==
      RfiStrategy(madK = 2.5, maxLog2 = 3))
  }

  test("two strategies, two occupancies on the same data") {
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    def occupancy(s: RfiStrategy): Long =
      RfiFlag(flagged, s).where(col("rfi")).count()
    val default_ = occupancy(RfiStrategy())
    val aggressive =
      occupancy(RfiStrategy.parse("mad_k = 2.0\nrho = 1.1"))
    assert(aggressive > default_,
      s"mad_k 2.0 should flag more than 6.0 ($aggressive vs $default_)")

    // direction weights and pol selection are load-bearing too
    val weighted = occupancy(RfiStrategy.parse(
      "mad_k = 5.0\npols = yy\ntime_weight = 2.0\nchan_weight = 0.5"))
    assert(weighted != default_,
      "non-default pol/weights must change the gated occupancy")
    // multi-pol detection is the OR of the per-pol masks: a 2-pol run
    // flags at least as much as either single-pol run
    val xxOnly = occupancy(RfiStrategy(madK = 4.0))
    val yyOnly = occupancy(RfiStrategy(madK = 4.0, pols = Seq("yy")))
    val both = occupancy(RfiStrategy(madK = 4.0, pols = Seq("xx", "yy")))
    assert(both >= math.max(xxOnly, yyOnly))
  }

  // modeled on the published AOFlagger default MWA strategy's shape
  // (function execute(input), local option block, sumthreshold + SIR
  // calls) with an observatory's tuned values
  private val tunedLua =
    """--[[ observatory-tuned MWA strategy (AOFlagger lua surface) ]]--
      |function execute(input)
      |  local base_threshold = 0.8333333333333334 -- rel. sensitivity
      |  local iteration_count = 1
      |  local sumthreshold_level_time = 0.5
      |  local sumthreshold_level_freq = 2.0
      |  local flag_polarizations = { aoflagger.Polarization.YY }
      |  local data = input:convert_to_complex("complex")
      |  aoflagger.sumthreshold(data, sumthreshold_level_time,
      |    sumthreshold_level_freq, true, true)
      |  aoflagger.scale_invariant_rank_operator(data, 0.3, 0.1)
      |  aoflagger.high_pass_filter(data, 21, 31, 2.5, 5.0)
      |  aoflagger.set_progress(1, 1)
      |end""".stripMargin

  test("Lua translation: tuned MWA-shaped file maps exactly onto the " +
    "q_r1b strategy + background windows; nothing left unmapped") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(tunedLua)
    // 6.0 * 0.8333333333333334 == 5.0 exactly in IEEE doubles, and the
    // 0.5 / 2.0 levels reciprocate exactly — the translation equals the
    // q_r1b gate's strategy bit-for-bit, plus the high_pass_filter
    // call mapped onto the GENUINE Gaussian background: kernel sizes
    // (21, 31) as half-windows (10, 15), the call's sigmas (2.5, 5.0)
    // passed through
    assert(tr.strategy == RfiStrategy.parse(
      "mad_k = 5.0\npols = yy\ntime_weight = 2.0\nchan_weight = 0.5\n" +
        "sir_eta_time = 0.3\nsir_eta_chan = 0.1\n" +
        "bg_kind = gaussian\nbg_window_time = 10\nbg_window_chan = 15\n" +
        "bg_sigma_time = 2.5\nbg_sigma_chan = 5.0"))
    assert(tr.unmapped.isEmpty, s"unmapped was ${tr.unmapped}")
  }

  test("Lua translation: q_r1b output reproduced end-to-end from the " +
    "translated file") {
    import graft.ops.LuaStrategy
    val dir = java.nio.file.Files.createTempDirectory("lua")
    val f = dir.resolve("mwa-tuned.lua")
    java.nio.file.Files.writeString(f, tunedLua)
    val tr = LuaStrategy.fromFile(f.toString)
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    val fromLua = RfiFlag(flagged, tr.strategy)
    val gate = RfiFlag(flagged, RfiStrategy.parse(
      "mad_k = 5.0\npols = yy\ntime_weight = 2.0\nchan_weight = 0.5\n" +
        "sir_eta_time = 0.3\nsir_eta_chan = 0.1\nbg_kind = gaussian\n" +
        "bg_sigma_time = 2.5\nbg_sigma_chan = 5.0\n" +
        "bg_window_time = 10\nbg_window_chan = 15"))
    assert(fromLua.except(gate).isEmpty && gate.except(fromLua).isEmpty,
      "translated Lua strategy must reproduce the gate rows")
  }

  test("Lua translation honesty: nested-paren and multi-line calls " +
    "are exhaustively accounted for (mapped or unmapped)") {
    import graft.ops.LuaStrategy
    val gnarly =
      """function execute(input)
        |  local iteration_count = 3
        |  local threshold_factor_step = 2.0
        |  aoflagger.sumthreshold(data, math.max(0.5, f(x, y)),
        |    2.0, true, true)
        |  aoflagger.low_pass_filter(data,
        |    kernel(21, 31),
        |    2.5, 5.0)
        |  aoflagger.apply_bandpass(data, "bandpass.txt")
        |  aoflagger.
        |end""".stripMargin
    val tr = LuaStrategy.translate(gnarly)
    // iteration knobs picked up from the local block
    assert(tr.strategy.iterations == 3 && tr.strategy.rampFactor == 2.0)
    // nested-paren sumthreshold still maps its resolvable freq level
    assert(tr.strategy.chanWeight == 0.5)
    // the multi-line nested-paren low_pass_filter surfaces verbatim;
    // the dangling `aoflagger.` is reported too; the bandpass call's
    // literal filename MAPS into the typed bandpassFiles seam
    assert(tr.unmapped.exists(_.contains("low_pass_filter")),
      s"unmapped was ${tr.unmapped}")
    assert(tr.bandpassFiles == Seq("bandpass.txt"))
    // exhaustiveness: every aoflagger. mention in the source is either
    // a mapped/scaffolding call or appears in unmapped — proven by
    // counting mentions: 4 mentions, 2 mapped (sumthreshold,
    // apply_bandpass), 2 reported
    val mentions = "aoflagger\\.".r.findAllIn(gnarly).length
    assert(mentions == 4 && tr.unmapped.length == 2,
      s"${tr.unmapped}")
  }

  test("Lua translation: a non-literal apply_bandpass filename is " +
    "reported, not guessed") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.apply_bandpass(data, bandpass_file)
        |end""".stripMargin)
    assert(tr.bandpassFiles.isEmpty &&
      tr.unmapped.exists(_.contains("apply_bandpass")))
  }

  test("Lua translation: a file that never calls SIR runs without " +
    "SIR, not with engine defaults") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.sumthreshold(data, 1.0, 1.0, true, true)
        |end""".stripMargin)
    assert(tr.strategy.sirEtaTime == 0.0 && tr.strategy.sirEtaChan == 0.0)
    assert(tr.unmapped.isEmpty)
  }

  test("Lua translation: realistic published-shaped MWA strategy — " +
    "EVERYTHING maps, including the whole-line RMS flaggers " +
    "(empty unmapped set)") {
    import graft.ops.LuaStrategy
    // the structure of AOFlagger's published MWA default strategy
    // (iteration ramp, masked SumThreshold, decimated low-pass
    // background with resubtraction, per-line RMS cleanup, SIR): the
    // engine models everything except the whole-line RMS flaggers
    val lua =
      """aoflagger.require_min_version("3.0")
        |
        |function execute(input)
        |  local base_threshold = 1.2
        |  local iteration_count = 3
        |  local threshold_factor_step = 2.0
        |  local inp_polarizations = input:get_polarizations()
        |  input:clear_mask()
        |  for ipol, polarization in ipairs(inp_polarizations) do
        |    local data = input:convert_to_polarization(polarization)
        |    local original_data = data:copy()
        |    for i = 1, iteration_count do
        |      local threshold_factor =
        |        math.pow(threshold_factor_step, iteration_count - i)
        |      local sumthr_level = threshold_factor * base_threshold
        |      aoflagger.sumthreshold_masked(data, original_data,
        |        sumthr_level, sumthr_level, true, true)
        |      -- per-line RMS cleanup (NOT modeled by the engine)
        |      local chdata = data:copy()
        |      aoflagger.threshold_timestep_rms(data, 3.5)
        |      aoflagger.threshold_channel_rms(chdata,
        |        3.0 * threshold_factor, true)
        |      data:join_mask(chdata)
        |      -- decimated high-pass background, resubtracted
        |      if i ~= iteration_count then
        |        data:set_visibilities(original_data)
        |        local resized_data = aoflagger.downsample(data, 3, 3, true)
        |        aoflagger.low_pass_filter(resized_data, 21, 31, 2.6, 5.0)
        |        aoflagger.upsample(resized_data, data, 3, 3)
        |        local tmp = original_data - data
        |        tmp:set_mask(data)
        |        data = tmp
        |      end
        |      aoflagger.set_progress(i, iteration_count)
        |    end
        |    input:set_polarization_data(polarization, data)
        |  end
        |  aoflagger.scale_invariant_rank_operator(input, 0.2, 0.2)
        |  aoflagger.threshold_timestep_rms(input, 4.0)
        |end""".stripMargin
    val tr = LuaStrategy.translate(lua)
    // the iteration ramp and sensitivity
    assert(tr.strategy.iterations == 3 && tr.strategy.rampFactor == 2.0)
    assert(tr.strategy.madK == 6.0 * 1.2)
    // the decimated low-pass bracket: kernel (21, 31) and sigmas
    // (2.6, 5.0) scale by the downsample factors (3, 3) to full
    // resolution -> half-windows (31, 46), sigmas (7.8..., 15.0)
    assert(tr.strategy.bgKind == "gaussian")
    assert(tr.strategy.bgWindowTime == 31 &&
      tr.strategy.bgWindowChan == 46)
    assert(tr.strategy.bgSigmaTime == 2.6 * 3 &&
      tr.strategy.bgSigmaChan == 15.0)
    // SIR post-extension
    assert(tr.strategy.sirEtaTime == 0.2 && tr.strategy.sirEtaChan == 0.2)
    // the whole-line RMS flaggers now MAP: the in-loop per-pol
    // timestep pass, the channel pass with its ramped threshold
    // resolved at the final-iteration ramp value (3.0 · 1) and
    // flag_low_outliers = true, and the final whole-set pass — whose
    // target `input` is recognised as the execute parameter
    assert(tr.strategy.tsRmsThreshold == 3.5)
    assert(tr.strategy.chRmsThreshold == 3.0 && tr.strategy.chRmsFlagLow)
    assert(tr.strategy.tsRmsFinal == 4.0)
    // nothing dropped...
    assert(tr.unmapped.isEmpty, s"unmapped was ${tr.unmapped}")
    // ...and the IN-LOOP RMS cleanup calls are now MODELED, not
    // approximated: the translator sets the in-loop placement flags
    // and the kernel runs the passes inside every detect iteration,
    // feeding the next iteration's statistics exactly as AOFlagger
    // does (q_r1f gates the placement; the feedback loop is pinned
    // below). The published strategy shape is a FULL-FIDELITY
    // migration: unmapped AND approximated both empty.
    assert(tr.strategy.tsRmsInLoop && tr.strategy.chRmsInLoop,
      s"in-loop placements not set: ${tr.strategy}")
    assert(tr.approximated.isEmpty,
      s"approximated: ${tr.approximated}")
  }

  test("in-loop RMS placement: the whole-set final pass inside a " +
    "loop body stays approximated (the combined grid does not exist " +
    "there)") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  for i = 1, 2 do
        |    aoflagger.sumthreshold(input, 1.0, 1.0, true, true)
        |    aoflagger.threshold_timestep_rms(input, 4.0)
        |  end
        |end""".stripMargin)
    assert(tr.strategy.tsRmsFinal == 4.0)
    assert(!tr.strategy.tsRmsInLoop,
      "the input-target pass must not set the per-pol in-loop flag")
    assert(tr.approximated.exists(a =>
      a.contains("whole-set final") && a.contains("inside a loop")),
      s"approximated: ${tr.approximated}")
  }

  // Engineered 8x8 feedback fixture (shared by the ts and ch in-loop
  // tests below). The hot line t = 3 sits at H = 1.06: invisible to
  // SumThreshold at BOTH iteration thresholds (the deepest chan-axis
  // window sums 8·0.06 = 0.48 < 8·χ₁/ρ³ even at the unramped
  // iteration-2 χ₁) but a massive line-RMS outlier (rmsQ 1060 vs 1000
  // on every background line). The background rows are three multisets
  // (A: 2 zeros + ±0.01×2 + ±0.04; G: ±0.01×2 + ±0.04×2; J: 4 zeros +
  // ±0.04×2) engineered so that (a) every background row's
  // milli-quantised RMS is exactly 1000 — the in-loop pass's
  // iteration-2 re-run sees zero variance and can never over-flag —
  // and (b) the grid-wide MAD CROSSES a deviation tier when the hot
  // row leaves the statistics: with the 8 hot cells the 64-sample
  // absolute-deviation median (index 32) lands in the 0.04 tier
  // (χ₁ = 6·1.4826·0.04 ≈ 0.267) while the 56 unflagged samples after
  // the in-loop pass put index 28 in the 0.01 tier (χ₁ ≈ 0.089). The
  // borderline cell B = 1.12 at (6,4) sits between the two: flagged
  // iff the hot row was removed from iteration 2's statistics. The
  // ±0.04 cells are staggered across rows so no SumThreshold window
  // ever accumulates them, even against the tighter fed threshold.
  private val fbRowA = Vector(1.00, 1.01, 0.96, 0.99, 1.00, 1.01, 0.99, 1.04)
  private val fbRowG = Vector(1.01, 0.96, 0.99, 1.04, 1.01, 0.96, 0.99, 1.04)
  private def fbRot(k: Int): Vector[Double] =
    Vector.tabulate(8)(i => fbRowG((i + k) % 8))
  private val fbRows: Map[Long, Vector[Double]] = Map(
    0L -> fbRowA, 1L -> fbRowG, 2L -> fbRot(3), 4L -> fbRot(6),
    5L -> fbRot(1),
    6L -> Vector(1.00, 1.04, 1.00, 0.96, 1.00, 1.04, 1.00, 0.96),
    7L -> Vector(0.96, 1.00, 1.04, 1.00, 0.96, 1.00, 1.04, 1.00))
  private val fbHot = 1.06
  private val fbBorder = 1.12
  /** amp of the feedback grid at (t, c): hot row t = 3, border (6,4). */
  private def fbAmp(t: Long, c: Long): Double =
    if (t == 3L) fbHot
    else if (t == 6L && c == 4L) fbBorder
    else fbRows(t)(c.toInt)

  test("in-loop RMS feedback: at iterations = 2 the in-loop flags " +
    "change the second iteration's statistics; at one iteration the " +
    "ts placement is positionally identical") {
    import graft.ops.{RfiCell, RfiFlag, RfiStrategy}
    def grid(): Array[RfiCell] =
      (for (t <- 0L until 8L; c <- 0L until 8L) yield
        RfiCell(0L, t, c, Seq(fbAmp(t, c)), flag = false)).toArray
    def run(inLoop: Boolean, iters: Int): Set[(Long, Long)] = {
      val s = RfiStrategy(madK = 6.0, sirEtaTime = 0.0,
        sirEtaChan = 0.0, iterations = iters, rmsIterations = 1,
        tsRmsThreshold = 2.5, tsRmsInLoop = inLoop)
      RfiFlag.detectGroup(0L, grid(), s)
        .filter(_.rfi).map(o => (o.t, o.chan)).toSet
    }
    val hotRow = (0L until 8L).map(c => (3L, c)).toSet
    // iterations = 1: in-loop and post-loop are the same position
    // (after the single detection, before SIR) — identical masks,
    // and the mask is exactly the hot row (line-RMS work only)
    val one = run(inLoop = true, 1)
    assert(one == run(inLoop = false, 1),
      "single-iteration ts placement must be positionally identical")
    assert(one == hotRow, s"iters=1 mask must be the hot row: $one")
    // iterations = 2: the in-loop pass flags the hot timestep after
    // iteration 1, removing it from iteration 2's MAD statistics —
    // χ₁ drops 0.267 → 0.089 and exposes the borderline cell (this is
    // the feedback AOFlagger's in-loop call sites get); the fixed
    // post-loop placement leaves the hot row in the statistics and
    // the borderline cell survives
    val fed = run(inLoop = true, 2)
    val fixed = run(inLoop = false, 2)
    assert(fixed == hotRow,
      s"post-loop placement must flag exactly the hot row: $fixed")
    assert(fed == hotRow + ((6L, 4L)),
      s"in-loop feedback must expose exactly the borderline cell: $fed")
  }

  test("in-loop RMS feedback, channel pass: iterations = 2 per-pol " +
    "chRmsInLoop feeds iteration 2; the post-loop combined pass does " +
    "not (transposed fixture, hot channel c = 3, borderline (4,6))") {
    import graft.ops.{RfiCell, RfiFlag, RfiStrategy}
    // transpose of the ts fixture: amp(t, c) = fbAmp(c, t) — hot
    // CHANNEL c = 3, borderline cell at (t, c) = (4, 6)
    def grid(): Array[RfiCell] =
      (for (t <- 0L until 8L; c <- 0L until 8L) yield
        RfiCell(0L, t, c, Seq(fbAmp(c, t)), flag = false)).toArray
    def run(inLoop: Boolean, iters: Int): Set[(Long, Long)] = {
      val s = RfiStrategy(madK = 6.0, sirEtaTime = 0.0,
        sirEtaChan = 0.0, iterations = iters, rmsIterations = 1,
        chRmsThreshold = 2.5, chRmsInLoop = inLoop)
      RfiFlag.detectGroup(0L, grid(), s)
        .filter(_.rfi).map(o => (o.t, o.chan)).toSet
    }
    val hotCol = (0L until 8L).map(t => (t, 3L)).toSet
    // same MAD-tier crossing as the ts test, along the other axis:
    // the in-loop per-pol channel pass removes the hot channel after
    // iteration 1 and iteration 2's χ₁ exposes the borderline cell;
    // the post-loop pass (combined mask, after SIR) cannot feed back
    assert(run(inLoop = false, 2) == hotCol,
      "post-loop ch placement must flag exactly the hot channel")
    assert(run(inLoop = true, 2) == hotCol + ((4L, 6L)),
      "in-loop ch feedback must expose exactly the borderline cell")
  }

  test("in-loop RMS feedback, channel pass, 2 pols: the pass runs " +
    "per polarisation image — a borderline cell present only in XX " +
    "is exposed by XX's own iteration-2 statistics") {
    import graft.ops.{RfiCell, RfiFlag, RfiStrategy}
    // XX = transposed fixture (hot channel + borderline); YY = the
    // same grid with the borderline cell quiet (1.00). max-over-pols
    // equals XX everywhere, so the post-loop combined pass sees the
    // identical column statistics as the single-pol test.
    def grid(): Array[RfiCell] =
      (for (t <- 0L until 8L; c <- 0L until 8L) yield {
        val xx = fbAmp(c, t)
        val yy = if (t == 4L && c == 6L) 1.00 else xx
        RfiCell(0L, t, c, Seq(xx, yy), flag = false)
      }).toArray
    def run(inLoop: Boolean): Set[(Long, Long)] = {
      val s = RfiStrategy(madK = 6.0, sirEtaTime = 0.0,
        sirEtaChan = 0.0, iterations = 2, rmsIterations = 1,
        chRmsThreshold = 2.5, chRmsInLoop = inLoop,
        pols = Seq("xx", "yy"))
      RfiFlag.detectGroup(0L, grid(), s)
        .filter(_.rfi).map(o => (o.t, o.chan)).toSet
    }
    val hotCol = (0L until 8L).map(t => (t, 3L)).toSet
    assert(run(inLoop = false) == hotCol,
      "post-loop combined ch pass must flag exactly the hot channel")
    // XX's in-loop feedback exposes (4,6); YY (quiet there) does not —
    // the OR combine carries XX's per-pol detection through
    assert(run(inLoop = true) == hotCol + ((4L, 6L)),
      "per-pol in-loop ch feedback must expose XX's borderline cell")
  }

  test("Lua translation: RMS cleanup calls at the engine's own " +
    "positions carry no approximation note; in-loop/pre-SIR ones do") {
    import graft.ops.LuaStrategy
    // cleanup-positioned: ts after the loop, ch after SIR -> exact
    val clean = LuaStrategy.translate(
      """function execute(input)
        |  for i = 1, 2 do
        |    aoflagger.sumthreshold(input, 1.0, 1.0, true, true)
        |  end
        |  aoflagger.scale_invariant_rank_operator(input, 0.2, 0.2)
        |  aoflagger.threshold_channel_rms(data, 3.0, true)
        |  aoflagger.threshold_timestep_rms(data, 3.5)
        |end""".stripMargin)
    assert(clean.approximated.isEmpty, s"${clean.approximated}")
    assert(clean.strategy.tsRmsThreshold == 3.5 &&
      clean.strategy.chRmsThreshold == 3.0)
    // channel pass BEFORE SIR (outside any loop): repositioning note
    val preSir = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.threshold_channel_rms(data, 3.0, true)
        |  aoflagger.scale_invariant_rank_operator(input, 0.2, 0.2)
        |end""".stripMargin)
    assert(preSir.approximated.exists(a =>
      a.contains("BEFORE") && a.contains("AFTER SIR")),
      s"${preSir.approximated}")
    assert(preSir.strategy.chRmsThreshold == 3.0)
    // loopSpans: while/repeat bodies count, if/function bodies don't
    val spans = LuaStrategy.loopSpans(
      """function f(x)
        |  if x then local y = 1 end
        |  while x do g() end
        |  repeat h() until x
        |end""".stripMargin)
    assert(spans.length == 2, s"spans: $spans")
  }

  test("Lua translation: a second RMS call re-targeting a slot with a " +
    "different threshold displaces the earlier call — reported, not " +
    "silently dropped") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.threshold_timestep_rms(data, 3.5)
        |  aoflagger.threshold_timestep_rms(data2, 2.0)
        |end""".stripMargin)
    // last wins (the same rule as every other repeated knob), the
    // displaced first call is accounted for
    assert(tr.strategy.tsRmsThreshold == 2.0)
    assert(tr.unmapped.exists(_.contains("3.5")), s"${tr.unmapped}")
    // a same-threshold repeat (the published per-pol loop shape) is
    // NOT a displacement
    val tr2 = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.threshold_timestep_rms(data, 3.5)
        |  aoflagger.threshold_timestep_rms(data2, 3.5)
        |end""".stripMargin)
    assert(tr2.strategy.tsRmsThreshold == 3.5 && tr2.unmapped.isEmpty)
  }

  test("Lua translation: a same-threshold RMS call at a DIFFERENT " +
    "loop position displaces the earlier call site — the last " +
    "placement wins and the displaced snippet is reported") {
    import graft.ops.LuaStrategy
    // in-loop then post-loop at the same threshold: two distinct
    // AOFlagger call sites — must NOT silently collapse into one
    // in-loop pass
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  for i = 1, 3 do
        |    aoflagger.sumthreshold(data, 1.0, 1.0, true, true)
        |    aoflagger.threshold_timestep_rms(data, 3.5)
        |  end
        |  aoflagger.threshold_timestep_rms(data, 3.5)
        |end""".stripMargin)
    assert(tr.strategy.tsRmsThreshold == 3.5)
    assert(!tr.strategy.tsRmsInLoop,
      "the post-loop re-call must clear the in-loop placement")
    assert(tr.unmapped.exists(_.contains("threshold_timestep_rms")),
      s"displaced in-loop call must be reported: ${tr.unmapped}")
    // and the mirror direction: post-loop then in-loop → ends in-loop
    val tr2 = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.threshold_channel_rms(data, 2.5, true)
        |  for i = 1, 3 do
        |    aoflagger.sumthreshold(data, 1.0, 1.0, true, true)
        |    aoflagger.threshold_channel_rms(data, 2.5, true)
        |  end
        |end""".stripMargin)
    assert(tr2.strategy.chRmsInLoop,
      "the in-loop re-call must set the in-loop placement")
    assert(tr2.unmapped.exists(_.contains("threshold_channel_rms")),
      s"displaced post-loop call must be reported: ${tr2.unmapped}")
    // a flag_low-only re-targeting is ALSO a displacement (same
    // threshold, same position, different pass semantics)
    val tr3 = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.threshold_channel_rms(data, 2.5, true)
        |  aoflagger.threshold_channel_rms(data, 2.5, false)
        |end""".stripMargin)
    assert(!tr3.strategy.chRmsFlagLow, "last call's flag_low wins")
    assert(tr3.unmapped.exists(_.contains("threshold_channel_rms")),
      s"flag_low re-targeting must be reported: ${tr3.unmapped}")
  }

  test("whole-line RMS flaggers do real work: each pass tightens " +
    "occupancy on the synthetic frame") {
    val flagged = FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark))
    def occupancy(extra: String): Long =
      RfiFlag(flagged, RfiStrategy.parse(extra)).where(col("rfi")).count()
    val base = occupancy("")
    val ts = occupancy("ts_rms_threshold = 1.02")
    val ch = occupancy("ch_rms_threshold = 1.01")
    val fin = occupancy("ts_rms_final = 1.03")
    assert(ts > base, s"timestep pass must flag lines ($ts vs $base)")
    assert(ch > base, s"channel pass must flag lines ($ch vs $base)")
    assert(fin > base, s"final pass must flag lines ($fin vs $base)")
  }

  test("Lua translation: stray downsample/upsample outside the " +
    "low-pass bracket are reported, not silently dropped") {
    import graft.ops.LuaStrategy
    val tr = LuaStrategy.translate(
      """function execute(input)
        |  local r = aoflagger.downsample(data, 2, 2, true)
        |  aoflagger.sumthreshold(data, 1.0, 1.0, true, true)
        |end""".stripMargin)
    assert(tr.unmapped.exists(_.contains("downsample")))
    val tr2 = LuaStrategy.translate(
      """function execute(input)
        |  aoflagger.upsample(r, data, 2, 2)
        |end""".stripMargin)
    assert(tr2.unmapped.exists(_.contains("upsample")))
    // mismatched factors do not close the bracket: the WHOLE bracket
    // (downsample, the low-pass it swallowed, the upsample) is
    // reported, and the held low-pass is NOT applied — reporting the
    // bracket dropped while silently baking in its scaled kernel
    // would contradict the honesty contract
    val tr3 = LuaStrategy.translate(
      """function execute(input)
        |  local r = aoflagger.downsample(data, 3, 3, true)
        |  aoflagger.low_pass_filter(r, 21, 31, 2.5, 5.0)
        |  aoflagger.upsample(r, data, 2, 2)
        |end""".stripMargin)
    assert(tr3.unmapped.exists(_.contains("upsample")))
    assert(tr3.unmapped.exists(_.contains("downsample")))
    assert(tr3.unmapped.exists(_.contains("low_pass_filter")))
    assert(tr3.strategy.bgKind == "median",
      s"held low-pass must not apply; got ${tr3.strategy}")
    // a downsample with no low-pass before its upsample reports both
    val tr4 = LuaStrategy.translate(
      """function execute(input)
        |  local r = aoflagger.downsample(data, 3, 3, true)
        |  aoflagger.upsample(r, data, 3, 3)
        |end""".stripMargin)
    assert(tr4.unmapped.exists(_.contains("downsample")) &&
      tr4.unmapped.exists(_.contains("upsample")))
  }
}
