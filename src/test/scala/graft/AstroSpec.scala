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
