package graft.functions

/** Astronomy kernels for the geometry correction's ephemeris-accurate
  * UVW table (reference: ERFA-backed precession in `correct_geometry`,
  * /root/reference/src/corrections.rs:207-293 and
  * /root/reference/doc/geometric_corrections.md).
  *
  * All formulae are from public standards literature:
  *  - GMST: IAU 1982 expression (Aoki et al. 1982), as tabulated in the
  *    Explanatory Supplement to the Astronomical Almanac;
  *  - precession: IAU 1976 (Lieske et al. 1977) equatorial precession
  *    angles ζ, z, θ — the classical rotation R3(-z)·R2(θ)·R3(-ζ).
  *
  * These are driver-side pure functions producing the small
  * (timestep x antenna) UVW dimension — isolated exactly so that a
  * higher-fidelity ephemeris (full ERFA port) can replace them without
  * touching the distributed operator (SURVEY §7.5 mitigation).
  */
object Astro {

  private val TwoPi = 2.0 * math.Pi

  /** Julian date from unix seconds (UTC, ignoring leap-second offset —
    * adequate for the synthetic obs; a production port would track
    * TAI-UTC as the reference does via hifitime).
    */
  def unixToJd(unixSec: Double): Double = 2440587.5 + unixSec / 86400.0

  /** GPS seconds → unix seconds (constant 315964800 offset, leap seconds
    * folded into dut1 handling as in the reference).
    */
  def gpsToUnix(gpsSec: Double): Double = gpsSec + 315964800.0

  /** Greenwich Mean Sidereal Time in radians (IAU 1982).
    * GMST(0hUT) polynomial + rotation rate on the UT1 fraction.
    */
  def gmstRad(jdUt1: Double): Double = {
    val t = (jdUt1 - 2451545.0) / 36525.0
    // seconds of time
    val gmstSec = 67310.54841 +
      (876600.0 * 3600.0 + 8640184.812866) * t +
      0.093104 * t * t - 6.2e-6 * t * t * t
    val frac = gmstSec / 86400.0
    val wrapped = frac - math.floor(frac)
    wrapped * TwoPi
  }

  /** IAU 1976 precession angles (ζ, z, θ) in radians for precessing
    * J2000.0 coordinates to the mean equator/equinox of the given epoch
    * (T in Julian centuries TT since J2000.0).
    */
  def precessionAngles(t: Double): (Double, Double, Double) = {
    val arcsec = math.Pi / 180.0 / 3600.0
    val zetaA = (2306.2181 * t + 0.30188 * t * t + 0.017998 * t * t * t) *
      arcsec
    val zA = (2306.2181 * t + 1.09468 * t * t + 0.018203 * t * t * t) *
      arcsec
    val thetaA = (2004.3109 * t - 0.42665 * t * t - 0.041833 * t * t * t) *
      arcsec
    (zetaA, zA, thetaA)
  }

  /** Precess J2000.0 (ra, dec) to the mean equinox of date.
    * Classical composition: with (ζ, z, θ),
    *   A = cos(dec)·sin(ra + ζ)
    *   B = cos(θ)·cos(dec)·cos(ra + ζ) − sin(θ)·sin(dec)
    *   C = sin(θ)·cos(dec)·cos(ra + ζ) + cos(θ)·sin(dec)
    *   ra' = atan2(A, B) + z,  dec' = asin(C)
    */
  def precessRaDec(raJ2000: Double, decJ2000: Double,
                   jdTt: Double): (Double, Double) = {
    val t = (jdTt - 2451545.0) / 36525.0
    val (zeta, z, theta) = precessionAngles(t)
    val a = math.cos(decJ2000) * math.sin(raJ2000 + zeta)
    val b = math.cos(theta) * math.cos(decJ2000) *
      math.cos(raJ2000 + zeta) - math.sin(theta) * math.sin(decJ2000)
    val c = math.sin(theta) * math.cos(decJ2000) *
      math.cos(raJ2000 + zeta) + math.cos(theta) * math.sin(decJ2000)
    val ra = math.atan2(a, b) + z
    val dec = math.asin(c)
    (((ra % TwoPi) + TwoPi) % TwoPi, dec)
  }

  /** Per-antenna partial UVW at one instant (the reference's
    * calc_part_uvws, corrections.rs:652-676): ENH → XYZ at latitude,
    * then rotate by local hour angle H = LST − ra and declination.
    */
  def partUvwAt(gpsSec: Double, lonRad: Double, latRad: Double,
                raJ2000: Double, decJ2000: Double, dut1Sec: Double,
                east: Double, north: Double, height: Double)
      : (Double, Double, Double) = {
    val unix = gpsToUnix(gpsSec)
    val jdUt1 = unixToJd(unix + dut1Sec)
    val lst = gmstRad(jdUt1) + lonRad
    val (ra, dec) = precessRaDec(raJ2000, decJ2000, unixToJd(unix))
    val ha = lst - ra
    val x = -north * math.sin(latRad) + height * math.cos(latRad)
    val y = east
    val z = north * math.cos(latRad) + height * math.sin(latRad)
    val (sh, ch) = (math.sin(ha), math.cos(ha))
    val (sd, cd) = (math.sin(dec), math.cos(dec))
    val u = sh * x + ch * y
    val v = -sd * ch * x + sd * sh * y + cd * z
    val w = cd * ch * x - cd * sh * y + sd * z
    (u, v, w)
  }
}
