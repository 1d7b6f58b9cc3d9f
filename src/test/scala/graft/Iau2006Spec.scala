package graft

import graft.functions.{Astro, Iau2006}
import org.scalatest.funsuite.AnyFunSuite

/** IAU 2006/2000B chain anchored against the published SOFA/ERFA
  * validation values (the check constants printed in SOFA's
  * `t_sofa_c.c` / ERFA's `t_erfa_c.c` self-test, which are public
  * standards-body documentation of the models this module implements).
  * These are the independent ground truth for the apparent-UVW gates
  * (q_c2b/q_c2c/q_c2d): the driver oracle pins self-consistency, these
  * anchors pin the astronomy.
  */
class Iau2006Spec extends AnyFunSuite {

  test("obl06: mean obliquity matches the published check value") {
    // eraObl06(2400000.5, 54388.0) = 0.4090749229387258204 rad
    val eps = Iau2006.obl06((2454388.5 - 2451545.0) / 36525.0)
    assert(math.abs(eps - 0.4090749229387258204) < 1e-12,
      s"obl06 off by ${eps - 0.4090749229387258204}")
  }

  test("nut00b: 77-term series matches the published check value") {
    // eraNut00b(2400000.5, 53736.0):
    //   dpsi = -0.9632552291148362783e-5 rad
    //   deps = +0.4063197106621159367e-4 rad
    val t = (2453736.5 - 2451545.0) / 36525.0
    val (dpsi, deps) = Iau2006.nut00b(t)
    assert(math.abs(dpsi - (-0.9632552291148362783e-5)) < 1e-12,
      s"dpsi off by ${dpsi - (-0.9632552291148362783e-5)} rad")
    assert(math.abs(deps - 0.4063197106621159367e-4) < 1e-12,
      s"deps off by ${deps - 0.4063197106621159367e-4} rad")
  }

  test("nut00b stays within the 2000B model envelope of IAU 1980") {
    // gross-error tripwire for the series table: the 2000-class and
    // 1980-class nutation differ by a few mas near J2000
    for (mjd <- Seq(50123.9999, 53736.0, 58849.0)) {
      val t = (mjd + 2400000.5 - 2451545.0) / 36525.0
      val (dp0, de0) = Astro.nutation(t)
      val (dp6, de6) = Iau2006.nut00b(t)
      assert(math.abs(dp6 - dp0) < 2e-7,
        s"dpsi(2000B) - dpsi(1980) = ${dp6 - dp0} rad at mjd $mjd")
      assert(math.abs(de6 - de0) < 2e-7,
        s"deps(2000B) - deps(1980) = ${de6 - de0} rad at mjd $mjd")
    }
  }

  test("era: Earth Rotation Angle matches the published check value") {
    // eraEra00(2400000.5, 54388.0) = 0.4022837240028158102 rad
    val era = Iau2006.era(2454388.5)
    assert(math.abs(era - 0.4022837240028158102) < 1e-12,
      s"era off by ${era - 0.4022837240028158102}")
  }

  test("gmst06 matches the published check value") {
    // eraGmst06(2400000.5, 53736.0, 2400000.5, 53736.0)
    //   = 1.754174971870091203 rad
    val g = Iau2006.gmst06(2453736.5, 2453736.5)
    assert(math.abs(g - 1.754174971870091203) < 1e-11,
      s"gmst06 off by ${g - 1.754174971870091203}")
  }

  test("gast06 matches the published IAU-2006/2000A value to ~1e-9") {
    // eraGst06a(2400000.5, 53736.0, ...) = 1.754166137675019159 rad;
    // this chain carries 2000B nutation, whose published deviation
    // from 2000A is ~1 mas-in-longitude class → a few 1e-9 rad in GAST
    val g = Iau2006.gast06(2453736.5, 2453736.5)
    assert(math.abs(g - 1.754166137675019159) < 5e-9,
      s"gast06 off by ${g - 1.754166137675019159}")
  }

  test("npb06 matrix matches the published pnm06a matrix at 1e-8") {
    // eraPnm06a(2400000.5, 50123.9999) — bias+precession+nutation;
    // tolerance covers the 2000B-for-2000A substitution (≲5e-9 per
    // element) while still excluding the 1976/1980 chain (≳1e-7 off)
    val m = Iau2006.npb06((2450124.4999 - 2451545.0) / 36525.0)
    val expect = Array(
      Array(0.9999995832794205484, 0.8372382772630962111e-3,
        0.3639684771140623099e-3),
      Array(-0.8372533744743683605e-3, 0.9999996486492861646,
        0.4132905944611019498e-4),
      Array(-0.3639337469629464969e-3, -0.4163377605910663999e-4,
        0.9999999329094260057))
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(m(i)(j) - expect(i)(j)) < 1e-8,
        s"npb06($i)($j) off by ${m(i)(j) - expect(i)(j)}")
    // and it must be a proper rotation
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => m(i)(k) * m(j)(k)).sum
      val id = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - id) < 1e-14, s"row orthonormality $i,$j")
    }
  }

  test("apparent partUvw (2006): rotation-preserving, near the " +
    "classical chain but not equal to it") {
    val deg = math.Pi / 180.0
    val (u6, v6, w6) = Iau2006.partUvwApparent06At(1254670393.0,
      2.0 * deg, -26.7 * deg, 1.0, -0.5, 0.05, 100.0, 50.0, 377.0)
    val norm = math.sqrt(u6 * u6 + v6 * v6 + w6 * w6)
    val enh = math.sqrt(100.0 * 100 + 50.0 * 50 + 377.0 * 377)
    assert(math.abs(norm - enh) < 1e-6, s"rotation norm: $norm vs $enh")
    val (u0, v0, w0) = Astro.partUvwApparentAt(1254670393.0,
      2.0 * deg, -26.7 * deg, 1.0, -0.5, 0.05, 100.0, 50.0, 377.0)
    val d = math.sqrt((u6 - u0) * (u6 - u0) + (v6 - v0) * (v6 - v0) +
      (w6 - w0) * (w6 - w0))
    // chains differ by the GCRS frame bias (~23 mas) + model revisions:
    // ~1e-7 rad on a ~400 m lever arm ⇒ tens of µm, and not zero
    assert(d > 1e-8 && d < 1e-3, s"chain separation $d m")
  }
}
