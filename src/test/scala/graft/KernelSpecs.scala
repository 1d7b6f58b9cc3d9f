package graft

import graft.functions.SumThresholdKernel
import graft.ops.PassbandGains.scrunchGains
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure kernels (SURVEY §5: scrunch_gains odd/even/
  * wrap cases per /root/reference/src/corrections.rs:678+, SumThreshold
  * behavioural checks).
  */
class KernelSpecs extends AnyFunSuite {

  // ---- scrunch_gains -------------------------------------------------

  test("scrunch simple: plain mean per window") {
    val g = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val out = scrunchGains(g, 2, centerSymmetric = false)
    assert(out.toSeq == Seq(1.5, 3.5, 5.5))
  }

  test("scrunch center-symmetric: flat table stays flat (weights sum to 1)") {
    for (outChans <- 1 to 8; v <- Seq(0.5, 1.0, 3.25);
         f <- Seq(2, 4, 8)) {
      val g = Array.fill(outChans * f)(v)
      val out = scrunchGains(g, f, centerSymmetric = true)
      assert(out.length == outChans)
      out.foreach(o => assert(math.abs(o - v) < 1e-12))
    }
  }

  test("scrunch center-symmetric: window wraps around the coarse channel") {
    // impulse at index 0; with fscrunch=2 the centred window of output 0
    // covers indices {-1 -> n-1, 0, 1} with edge weights 1/2
    val n = 8
    val g = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
    val out = scrunchGains(g, 2, centerSymmetric = true)
    // output 0 window: [-1, 0, 1] weights [.5, 1, .5] / 2 -> g0 = 1/2
    assert(math.abs(out(0) - 0.5) < 1e-12)
    // last output window: [n-3, n-2, n-1] does not see index 0...
    // but output over centre n-2: window [n-3, n-2, n-1] -> 0
    assert(math.abs(out(n / 2 - 1)) < 1e-12)
  }

  test("sumthreshold strategy knobs: scale depth and rho change detection") {
    // one weak broad blob: each sample below chi1, but a length-2
    // window exceeds its decayed threshold under the default rho=1.5
    val amp = Array(Array(0.0, 0.0, 0.0, 0.0, 0.9, 0.9, 0.0, 0.0))
    val none = Array(Array.fill(8)(false))
    val default_ = SumThresholdKernel.flagMatrix(amp, none, 1.0)
    assert(default_(0).count(identity) >= 2, "default flags the blob")
    val shallow = SumThresholdKernel.flagMatrix(amp, none, 1.0,
      maxLog2 = 0)
    assert(shallow(0).forall(!_), "single-sample scale only: no flags")
    val noDecay = SumThresholdKernel.flagMatrix(amp, none, 1.0,
      maxLog2 = 5, rho = 1.0)
    assert(noDecay(0).forall(!_), "rho=1 keeps thresholds flat: no flags")
  }

  // ---- golden cases: the reference's own scrunch tests, exact doubles
  // (/root/reference/src/corrections.rs:1448-1533, power-of-2 gains so
  // every expected value is exact in IEEE doubles)

  test("scrunch golden legacy: fscrunch=2 over 30 chans (rs:1449)") {
    val g = Array.tabulate(30)(x => math.pow(2.0, x))
    val exp = Array.tabulate(15)(x =>
      (math.pow(2.0, 2 * x) + math.pow(2.0, 2 * x + 1)) / 2.0)
    assert(scrunchGains(g, 2, centerSymmetric = false).toSeq == exp.toSeq)
  }

  test("scrunch golden mwax even/even: f=2 over 12 chans (rs:1461)") {
    val g = Array.tabulate(12)(x => math.pow(2.0, x))
    val exp = Array.tabulate(6) { x =>
      val left = g(math.floorMod(2 * x - 1, 12))
      g(2 * x) / 2.0 + left / 4.0 + g(2 * x + 1) / 4.0
    }
    assert(scrunchGains(g, 2, centerSymmetric = true).toSeq == exp.toSeq)
  }

  test("scrunch golden mwax odd-f/even-out: f=3 over 12 chans (rs:1483)") {
    val g = Array.tabulate(12)(x => math.pow(2.0, x))
    val exp = Array.tabulate(4) { x =>
      g(math.floorMod(3 * x - 1, 12)) / 3.0 + g(3 * x) / 3.0 +
        g(3 * x + 1) / 3.0
    }
    assert(scrunchGains(g, 3, centerSymmetric = true).toSeq == exp.toSeq)
  }

  test("scrunch golden mwax even-f/odd-out: f=4 over 12 chans (rs:1500)") {
    val g = Array.tabulate(12)(x => math.pow(2.0, x))
    val exp = Array.tabulate(3) { x =>
      g(4 * x) / 8.0 + g(4 * x + 1) / 4.0 + g(4 * x + 2) / 4.0 +
        g(4 * x + 3) / 4.0 + g(math.floorMod(4 * x + 4, 12)) / 8.0
    }
    assert(scrunchGains(g, 4, centerSymmetric = true).toSeq == exp.toSeq)
  }

  test("scrunch golden mwax odd-f/odd-out: f=3 over 15 chans (rs:1519)") {
    val g = Array.tabulate(15)(x => math.pow(2.0, x))
    val exp = Array.tabulate(5) { x =>
      g(3 * x) / 6.0 + g(3 * x + 1) / 3.0 + g(3 * x + 2) / 3.0 +
        g(math.floorMod(3 * x + 3, 15)) / 6.0
    }
    assert(scrunchGains(g, 3, centerSymmetric = true).toSeq == exp.toSeq)
  }

  // ---- published PFB tables (model.PfbTables resources) --------------

  test("published PFB tables: shape, first values, auto-selection") {
    import graft.model.PfbTables._
    assert(Jake2022_200Hz.length == 6400)
    assert(OsJake2025_200Hz.length == 6400)
    assert(Cotter2014_10kHz.length == 128)
    // spot anchors from the reference data file (passband_gains.rs:10)
    assert(Jake2022_200Hz(0) == 5.00035573710785e-01)
    assert(select(CorrMwaxV2, oversampled = false,
      derippleApplied = false).get eq Jake2022_200Hz)
    assert(select(CorrMwaxV2, oversampled = true,
      derippleApplied = false).get eq OsJake2025_200Hz)
    assert(select(CorrLegacy, oversampled = false,
      derippleApplied = false).get eq Cotter2014_10kHz)
    assert(select(CorrMwaxV2, oversampled = false,
      derippleApplied = true).isEmpty)
    // scrunched to the observation resolution: right length, near the
    // table mean (the PFB ripple is a few percent around its plateau)
    val s = scrunched(CorrMwaxV2)
    assert(s.length == graft.model.Obs.FineChansPerCoarse)
    val sc = scrunched(CorrLegacy)
    assert(sc.length == graft.model.Obs.FineChansPerCoarse)
    assert(s.forall(v => v > 0.0) && sc.forall(v => v > 0.0))
  }

  test("scrunch simple: factor must divide length") {
    assertThrows[IllegalArgumentException] {
      scrunchGains(Array(1.0, 2.0, 3.0), 2, centerSymmetric = false)
    }
  }

  test("scrunch center-symmetric odd-output case: window starts at centre") {
    // n=15, f=3 -> out=5 (odd): offsets 0..3, edge weights 1/2
    // (reference corrections.rs (CenterSymmetric, 1, _) arm)
    val g = Array.tabulate(15)(i => if (i == 0) 1.0 else 0.0)
    val out = scrunchGains(g, 3, centerSymmetric = true)
    // impulse at 0 contributes to sc=0 (offset 0, w=.5/3) and, wrapping,
    // to sc=4 (12+3=15 -> 0, offset 3, w=.5/3)
    assert(math.abs(out(0) - 0.5 / 3) < 1e-12)
    assert(math.abs(out(4) - 0.5 / 3) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    // flat stays flat
    val flat = scrunchGains(Array.fill(15)(2.0), 3, centerSymmetric = true)
    flat.foreach(v => assert(math.abs(v - 2.0) < 1e-12))
  }

  test("scrunch center-symmetric even-output odd-fscrunch: equal weights") {
    // n=12, f=3 -> out=4 (even, odd f): offsets -1..1, equal 1/3
    val g = Array.tabulate(12)(i => if (i == 11) 3.0 else 0.0)
    val out = scrunchGains(g, 3, centerSymmetric = true)
    // index 11 = offset -1 of centre 0 (wraps) -> sc=0 gets 3/3 = 1
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(3) - 0.0) < 1e-12) // centre 9: idx 8,9,10
    val flat = scrunchGains(Array.fill(12)(0.5), 3, centerSymmetric = true)
    flat.foreach(v => assert(math.abs(v - 0.5) < 1e-12))
  }

  test("scrunch fscrunch=1 is identity") {
    val g = Array(1.0, 2.0, 3.0)
    assert(scrunchGains(g, 1, centerSymmetric = true).toSeq == g.toSeq)
  }

  // ---- SumThreshold --------------------------------------------------

  private def mkMatrix(nt: Int, nc: Int, base: Double = 1.0) =
    Array.fill(nt, nc)(base)

  test("sumthreshold: flat matrix stays unflagged") {
    val amp = mkMatrix(16, 16)
    val flg = Array.fill(16, 16)(false)
    val chi1 = SumThresholdKernel.baseThreshold(amp.flatten)
    val out = SumThresholdKernel.flagMatrix(amp, flg, chi1)
    assert(!out.flatten.exists(identity))
  }

  test("sumthreshold: single hot sample is flagged") {
    val amp = mkMatrix(16, 16)
    amp(7)(9) = 100.0
    val flg = Array.fill(16, 16)(false)
    val chi1 = SumThresholdKernel.baseThreshold(amp.flatten)
    val out = SumThresholdKernel.flagMatrix(amp, flg, chi1)
    assert(out(7)(9))
    assert(out.flatten.count(identity) < 16)
  }

  test("sumthreshold: broad faint RFI caught at larger scales") {
    val amp = mkMatrix(32, 32)
    // a faint broadband line across all channels at t=5: 1.8x base, below
    // the single-sample threshold but above chi_M for long windows
    for (c <- 0 until 32) amp(5)(c) = 1.8
    val flg = Array.fill(32, 32)(false)
    val chi1 = 2.0 // single-sample threshold above 1.8
    val out = SumThresholdKernel.flagMatrix(amp, flg, chi1)
    assert((0 until 32).forall(c => out(5)(c)),
      s"flagged ${out(5).count(identity)}/32 of the faint line")
    // the clean row below stays clean
    assert((0 until 32).forall(c => !out(6)(c)))
  }

  test("sir: single flag dilates by eta-fraction intervals, exact " +
    "brute-force parity") {
    import graft.functions.SirKernel
    // one flag in 32 samples at eta=0.5: an interval [a,b) containing
    // it qualifies while flagged fraction >= 0.5, i.e. length <= 2 -> the
    // flag extends one sample each side
    val flags = Array.tabulate(32)(_ == 16)
    val out = SirKernel.extend(flags, SirKernel.etaNum(0.5))
    assert(out.count(identity) == 3 && out(15) && out(16) && out(17))
  }

  test("sir: eta=0 is the identity; all-flagged stays all-flagged") {
    import graft.functions.SirKernel
    val flags = Array(false, true, true, false, true, false, false)
    assert(SirKernel.extend(flags, 0L).sameElements(flags))
    val all = Array.fill(9)(true)
    assert(SirKernel.extend(all, SirKernel.etaNum(0.2))
      .sameElements(all))
  }

  test("sir: two nearby flag blocks bridge when the gap fraction " +
    "allows") {
    import graft.functions.SirKernel
    // blocks [4,8) and [10,14) with a 2-gap: over [4,14) the flagged
    // fraction is 8/10 = 0.8 >= 1 - 0.25 -> the gap bridges at eta=0.25
    val flags = Array.tabulate(20)(i => (i >= 4 && i < 8) ||
      (i >= 10 && i < 14))
    val out = SirKernel.extend(flags, SirKernel.etaNum(0.25))
    assert((8 until 10).forall(out), "gap bridged")
    // at eta=0.05 a 10-interval needs >= 9.5 flagged -> no bridge
    val tight = SirKernel.extend(flags, SirKernel.etaNum(0.05))
    assert(!(8 until 10).exists(tight), "gap kept at tight eta")
  }

  test("sumthreshold: existing flags contribute chi, not their value") {
    val amp = mkMatrix(8, 8)
    amp(3)(3) = 1e9 // absurd value, but pre-flagged
    val flg = Array.fill(8, 8)(false)
    flg(3)(3) = true
    val out = SumThresholdKernel.flagMatrix(amp, flg, 2.0)
    // neighbours must NOT be flagged by the masked spike
    assert(!out(3)(2) && !out(3)(4) && !out(2)(3) && !out(4)(3))
  }

  test("background: separable sliding median matches brute force; " +
    "flagged cells excluded; empty windows fall back to global") {
    import graft.functions.BackgroundKernel
    val rnd = new scala.util.Random(42)
    val (nt, nc, wt, wc) = (11, 7, 2, 1)
    val amp = Array.fill(nt, nc)(rnd.nextDouble() * 10)
    val use = Array.fill(nt, nc)(rnd.nextDouble() > 0.3)
    // one fully-flagged channel strip to hit the fallback path
    (0 until nt).foreach(i => use(i)(5) = false)
    val got = BackgroundKernel.estimate(amp, use, wt, wc)
    // brute force, straight from the definition
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) Double.NaN
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val global = med(for {
      i <- 0 until nt; j <- 0 until nc if use(i)(j)
    } yield amp(i)(j))
    for (i <- 0 until nt; j <- 0 until nc) {
      val b1 = for (k <- math.max(0, j - wc) to math.min(nc - 1, j + wc))
        yield med(for {
          l <- math.max(0, i - wt) to math.min(nt - 1, i + wt)
          if use(l)(k)
        } yield amp(l)(k))
      val expect = med(b1.filterNot(_.isNaN)) match {
        case m if m.isNaN => if (global.isNaN) 0.0 else global
        case m => m
      }
      assert(got(i)(j) == expect, s"cell ($i,$j)")
    }
  }

  test("background: gaussian masked convolution matches brute force, " +
    "is exact-constant on flat input, falls back when fully masked") {
    import graft.functions.BackgroundKernel
    val wT = BackgroundKernel.gaussWeights(2, 1.5)
    val wC = BackgroundKernel.gaussWeights(1, 1.0)
    // taps are symmetric, centre-normalised to 1024, monotone outward
    assert(wT.length == 5 && wT(2) == 1024L && wT(0) == wT(4) &&
      wT(1) == wT(3) && wT(0) < wT(1) && wT(1) < wT(2))
    val rnd = new scala.util.Random(7)
    val (nt, nc) = (10, 8)
    val amp = Array.fill(nt, nc)(rnd.nextDouble() * 5)
    val ampMicro = amp.map(_.map(a => math.floor(a * 1e6 + 0.5).toLong))
    val use = Array.fill(nt, nc)(rnd.nextDouble() > 0.3)
    (0 until nt).foreach(i => use(i)(6) = false) // masked strip
    val got = BackgroundKernel.estimateGaussianMicro(ampMicro, use, wT, wC)
    // brute force straight from the two-pass definition
    val gN = (for { i <- 0 until nt; j <- 0 until nc if use(i)(j) }
      yield ampMicro(i)(j)).sum
    val gD = (for { i <- 0 until nt; j <- 0 until nc if use(i)(j) }
      yield 1L).sum
    for (i <- 0 until nt; j <- 0 until nc) {
      var n2 = 0L; var d2 = 0L
      for (l <- -1 to 1; jj = j + l if jj >= 0 && jj < nc) {
        for (k <- -2 to 2; ii = i + k if ii >= 0 && ii < nt
             if use(ii)(jj)) {
          n2 += wC(l + 1) * wT(k + 2) * ampMicro(ii)(jj)
          d2 += wC(l + 1) * wT(k + 2)
        }
      }
      val expect =
        if (d2 > 0) n2.toDouble / d2.toDouble
        else if (gD > 0) gN.toDouble / gD.toDouble else 0.0
      assert(got(i)(j) == expect, s"cell ($i,$j)")
    }
    // flat unmasked input: normalized convolution returns the input
    // value EXACTLY everywhere (numerator = value × denominator)
    val flat = Array.fill(nt, nc)(2500000L)
    val all = Array.fill(nt, nc)(true)
    val bgFlat = BackgroundKernel.estimateGaussianMicro(flat, all, wT, wC)
    assert(bgFlat.forall(_.forall(_ == 2500000.0)))
    // fully masked: global fallback is 0
    val none = Array.fill(nt, nc)(false)
    val bgNone = BackgroundKernel.estimateGaussianMicro(flat, none, wT, wC)
    assert(bgNone.forall(_.forall(_ == 0.0)))
  }

  test("background: iterated detection unmasks faint RFI under a " +
    "sloped bandpass that the constant background misses") {
    import graft.ops.{RfiStrategy, RfiFlag}
    // a strong spectral slope + faint broadband RFI at one timestep:
    // with a constant median background the slope dominates the MAD
    // and hides the RFI; the sliding median removes the slope
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val nt = 24; val nc = 24
    val rows = for (t <- 0 until nt; c <- 0 until nc) yield {
      val slope = 10.0 * c // bandpass ramp across channels
      val noise = math.sin(t * 12.9898 + c * 78.233) * 0.05
      val rfi = if (t == 10) 1.5 else 0.0
      (0L, t.toLong, c.toLong, slope + noise + rfi, 0.0, false)
    }
    val df = rows.toDF("bl", "t", "chan", "v0", "v1", "flag")
    def occ(s: RfiStrategy): Long =
      RfiFlag(df, s).where("rfi").count()
    val constBg = occ(RfiStrategy(madK = 5.0, sirEtaTime = 0,
      sirEtaChan = 0))
    val slidingBg = occ(RfiStrategy(madK = 5.0, sirEtaTime = 0,
      sirEtaChan = 0, bgWindowTime = 3, bgWindowChan = 5,
      iterations = 2))
    // the slope-removed detection finds the t=10 broadband line
    assert(slidingBg >= nc.toLong,
      s"sliding background should flag the RFI line ($slidingBg)")
    assert(slidingBg > constBg,
      s"sliding ($slidingBg) must beat constant ($constBg)")
  }
}
