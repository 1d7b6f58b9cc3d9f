package graft

import graft.functions.Astro
import org.scalatest.funsuite.AnyFunSuite

/** Astronomy kernel checks against public reference values. */
class AstroSpec extends AnyFunSuite {

  val deg: Double = math.Pi / 180.0

  test("GMST at J2000.0 epoch matches the canonical value") {
    // 2000-01-01 12:00 UT = JD 2451545.0; GMST = 18h 41m 50.54841s
    // (Explanatory Supplement / Meeus example value 280.46061837 deg)
    val gmst = Astro.gmstRad(2451545.0)
    val expect = 280.46061837 * deg % (2 * math.Pi)
    assert(math.abs(gmst - expect) < 1e-9,
      s"gmst=${gmst / deg} deg, expect ${expect / deg}")
  }

  test("GMST example: 1987 April 10 0h UT (Meeus ex. 12.a)") {
    // JD 2446895.5 -> GMST = 13h 10m 46.3668s = 197.693195 deg
    val gmst = Astro.gmstRad(2446895.5)
    val expect = 197.693195 * deg
    assert(math.abs(gmst - expect) < 1e-6 * deg * 3600,
      s"gmst=${gmst / deg}")
  }

  test("precession: theta Persei J2000 -> 2028 Nov 13.19 (Meeus ex. 21.b)") {
    // alpha = 2h44m11.986s, delta = +49d13'42.48" (J2000)
    // at JD 2462088.69: alpha' = 2h46m11.331s, delta' = +49d20'54.54"
    // Meeus applies the star's proper motion over the 28.86-yr interval
    // before precessing: mu_ra = +0.03425 s/yr, mu_dec = -0.0895 "/yr
    val years = (2462088.69 - 2451545.0) / 365.25
    val ra0 = (2.0 + 44.0 / 60 + (11.986 + 0.03425 * years) / 3600) *
      15 * deg
    val dec0 = (49.0 + 13.0 / 60 + (42.48 - 0.0895 * years) / 3600) * deg
    val (ra1, dec1) = Astro.precessRaDec(ra0, dec0, 2462088.69)
    val raExp = (2.0 + 46.0 / 60 + 11.331 / 3600) * 15 * deg
    val decExp = (49.0 + 20.0 / 60 + 54.54 / 3600) * deg
    assert(math.abs(ra1 - raExp) < 0.1 / 3600 * 15 * deg,
      s"ra ${ra1 / deg} vs ${raExp / deg}")
    assert(math.abs(dec1 - decExp) < 0.1 / 3600 * deg,
      s"dec ${dec1 / deg} vs ${decExp / deg}")
  }

  test("nutation + obliquity: 1987 April 10 0h TT (Meeus ex. 22.a)") {
    // published: dpsi = -3.788", deps = +9.443",
    // eps0 = 23d26'27.407", true eps = 23d26'36.850"
    val t = (2446895.5 - 2451545.0) / 36525.0
    val (dpsi, deps) = Astro.nutation(t)
    val arc = deg / 3600.0
    // full 63-term table: match the published example to its own
    // rounding (0.001") — the truncated series only reached ~0.02"
    assert(math.abs(dpsi / arc - (-3.788)) < 0.001,
      s"dpsi=${dpsi / arc}")
    assert(math.abs(deps / arc - 9.443) < 0.001, s"deps=${deps / arc}")
    val eps0 = Astro.meanObliquityRad(t)
    val eps0Exp = (23.0 + 26.0 / 60 + 27.407 / 3600) * deg
    assert(math.abs(eps0 - eps0Exp) < 0.002 * arc,
      s"eps0=${eps0 / deg}")
    val epsTrue = (eps0 + deps) / deg
    val epsExp = 23.0 + 26.0 / 60 + 36.850 / 3600
    assert(math.abs(epsTrue - epsExp) < 0.06 / 3600, s"eps=$epsTrue")
  }

  test("apparent place: theta Persei 2028 Nov 13.19 TT (Meeus ex. 23.a)") {
    // published apparent place (precession + nutation + aberration):
    // alpha = 2h46m14.390s, delta = +49d21'07.45"; proper motion applied
    // over the J2000 -> epoch interval first, as in ex. 21.b. The
    // truncated nutation series + low-precision solar theory land within
    // a few hundredths of an arcsecond; gate at 0.2".
    val years = (2462088.69 - 2451545.0) / 365.25
    val ra0 = (2.0 + 44.0 / 60 + (11.986 + 0.03425 * years) / 3600) *
      15 * deg
    val dec0 = (49.0 + 13.0 / 60 + (42.48 - 0.0895 * years) / 3600) * deg
    val (ra1, dec1) = Astro.apparentRaDec(ra0, dec0, 2462088.69)
    val raExp = (2.0 + 46.0 / 60 + 14.390 / 3600) * 15 * deg
    val decExp = (49.0 + 21.0 / 60 + 7.45 / 3600) * deg
    assert(math.abs(ra1 - raExp) < 0.2 / 3600 * 15 * deg,
      s"ra ${(ra1 - raExp) / deg * 3600 / 15} s-arc off")
    assert(math.abs(dec1 - decExp) < 0.2 / 3600 * deg,
      s"dec ${(dec1 - decExp) / deg * 3600} arcsec off")
  }

  test("GAST differs from GMST by the equation of the equinoxes") {
    val jd = 2446895.5
    val t = (jd - 2451545.0) / 36525.0
    val (dpsi, deps) = Astro.nutation(t)
    val eqeq = dpsi * math.cos(Astro.meanObliquityRad(t) + deps)
    val diff = Astro.gastRad(jd, jd) - Astro.gmstRad(jd)
    // both are wrapped to [0, 2pi); compare modulo 2pi
    val wrapped = math.atan2(math.sin(diff - eqeq), math.cos(diff - eqeq))
    assert(math.abs(wrapped) < 1e-12)
    // Meeus 12.a quotes eqeq ~ -0.2317s of time = -3.476" at this epoch
    assert(math.abs(eqeq / (deg / 3600.0) - (-3.476)) < 0.1,
      s"eqeq=${eqeq / (deg / 3600.0)}")
  }

  test("apparent partUvw stays a rotation and differs from mean-place") {
    val (u1, v1, w1) = Astro.partUvwApparentAt(1254670393.0, 2.0 * deg,
      -26.7 * deg, 1.0, -0.5, 0.05, 100.0, 50.0, 377.0)
    val norm = math.sqrt(u1 * u1 + v1 * v1 + w1 * w1)
    val enh = math.sqrt(100.0 * 100 + 50.0 * 50 + 377.0 * 377)
    assert(math.abs(norm - enh) < 1e-6)
    val (_, _, w2) = Astro.partUvwAt(1254670393.0, 2.0 * deg,
      -26.7 * deg, 1.0, -0.5, 0.05, 100.0, 50.0, 377.0)
    assert(w1 != w2, "nutation+aberration must shift w")
  }

  test("partUvwAt: baseline difference is phase-consistent for autos") {
    val (u1, v1, w1) = Astro.partUvwAt(1254670393.0, 2.0 * deg,
      -26.7 * deg, 1.0, -0.5, 0.0, 100.0, 50.0, 377.0)
    val (u2, v2, w2) = Astro.partUvwAt(1254670393.0, 2.0 * deg,
      -26.7 * deg, 1.0, -0.5, 0.0, 100.0, 50.0, 377.0)
    assert(u1 == u2 && v1 == v2 && w1 == w2)
    // magnitude bounded by geometric extent
    val norm = math.sqrt(u1 * u1 + v1 * v1 + w1 * w1)
    val enh = math.sqrt(100.0 * 100 + 50.0 * 50 + 377.0 * 377)
    assert(math.abs(norm - enh) < 1e-6,
      s"rotation must preserve length: $norm vs $enh")
  }
}
