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

  test("sumthreshold: existing flags contribute chi, not their value") {
    val amp = mkMatrix(8, 8)
    amp(3)(3) = 1e9 // absurd value, but pre-flagged
    val flg = Array.fill(8, 8)(false)
    flg(3)(3) = true
    val out = SumThresholdKernel.flagMatrix(amp, flg, 2.0)
    // neighbours must NOT be flagged by the masked spike
    assert(!out(3)(2) && !out(3)(4) && !out(2)(3) && !out(4)(3))
  }
}
