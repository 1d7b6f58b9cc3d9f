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

  /** Julian date from unix seconds on the SAME time scale (the unix
    * count is treated as a uniform day count — use [[ttJd]] when a
    * Terrestrial Time date is needed from a UTC-based unix count).
    */
  def unixToJd(unixSec: Double): Double = 2440587.5 + unixSec / 86400.0

  /** TAI−UTC leap-second table (IERS Bulletin C — public standards
    * data; thresholds as unix seconds of the UTC day each leap took
    * effect). 37 s since 2017-01-01 is current through the mid-2020s.
    * The reference gets the same accounting from hifitime.
    */
  private val LeapSeconds: Array[(Long, Double)] = {
    def ep(y: Int, m: Int): Long =
      java.time.LocalDate.of(y, m, 1).toEpochDay * 86400L
    Array(
      ep(1972, 1) -> 10.0, ep(1972, 7) -> 11.0, ep(1973, 1) -> 12.0,
      ep(1974, 1) -> 13.0, ep(1975, 1) -> 14.0, ep(1976, 1) -> 15.0,
      ep(1977, 1) -> 16.0, ep(1978, 1) -> 17.0, ep(1979, 1) -> 18.0,
      ep(1980, 1) -> 19.0, ep(1981, 7) -> 20.0, ep(1982, 7) -> 21.0,
      ep(1983, 7) -> 22.0, ep(1985, 7) -> 23.0, ep(1988, 1) -> 24.0,
      ep(1990, 1) -> 25.0, ep(1991, 1) -> 26.0, ep(1992, 7) -> 27.0,
      ep(1993, 7) -> 28.0, ep(1994, 7) -> 29.0, ep(1996, 1) -> 30.0,
      ep(1997, 7) -> 31.0, ep(1999, 1) -> 32.0, ep(2006, 1) -> 33.0,
      ep(2009, 1) -> 34.0, ep(2012, 7) -> 35.0, ep(2015, 7) -> 36.0,
      ep(2017, 1) -> 37.0)
  }

  /** TAI−UTC (seconds) at a UTC unix epoch; 0 before 1972. */
  def taiMinusUtc(unixSec: Double): Double = {
    var i = LeapSeconds.length - 1
    while (i >= 0) {
      if (unixSec >= LeapSeconds(i)._1) return LeapSeconds(i)._2
      i -= 1
    }
    0.0
  }

  /** Terrestrial Time Julian date from a UTC unix epoch:
    * TT = UTC + (TAI−UTC) + 32.184 s.
    */
  def ttJd(unixSec: Double): Double =
    unixToJd(unixSec + taiMinusUtc(unixSec) + 32.184)

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

  // ---- apparent-place chain (nutation + aberration + dut1) -----------
  //
  // The reference reaches ERFA-level apparent places via `calc_part_uvws`
  // (/root/reference/src/corrections.rs:652-676). Here the same chain is
  // built from the public standards literature: IAU 1980 nutation
  // (truncated series, largest terms — residual < 0.02″), IAU 1980 mean
  // obliquity, annual aberration (Meeus, Astronomical Algorithms ch. 23
  // low-precision form with the e·cos π terms, accuracy ~0.01″), and
  // apparent sidereal time GAST = GMST + Δψ·cos ε.

  private val ArcsecRad = math.Pi / 180.0 / 3600.0
  private val DegRad = math.Pi / 180.0

  /** IAU 1980 mean obliquity of the ecliptic (radians), T in Julian
    * centuries TT from J2000.0.
    */
  def meanObliquityRad(t: Double): Double =
    (84381.448 - 46.8150 * t - 0.00059 * t * t + 0.001813 * t * t * t) *
      ArcsecRad

  /** The IAU 1980 nutation series as printed in Meeus Table 22.A (the
    * 63 periodic terms with coefficients ≥ 0.0003″; the remaining 43
    * terms of the full 106-term theory each contribute < 0.0003″ and
    * sum below ~0.001″ — beyond the published anchors' own rounding).
    * Columns: Delaunay argument multipliers (D, M, M′, F, Ω), then
    * Δψ coefficient, its T-rate, Δε coefficient, its T-rate (0.0001″
    * units). Anchored by the worked example in AstroSpec (Δψ/Δε at
    * 1987-04-10 to 0.001″).
    */
  private val NutTerms: Seq[(Int, Int, Int, Int, Int,
    Double, Double, Double, Double)] = Seq(
    (0, 0, 0, 0, 1, -171996.0, -174.2, 92025.0, 8.9),
    (-2, 0, 0, 2, 2, -13187.0, -1.6, 5736.0, -3.1),
    (0, 0, 0, 2, 2, -2274.0, -0.2, 977.0, -0.5),
    (0, 0, 0, 0, 2, 2062.0, 0.2, -895.0, 0.5),
    (0, 1, 0, 0, 0, 1426.0, -3.4, 54.0, -0.1),
    (0, 0, 1, 0, 0, 712.0, 0.1, -7.0, 0.0),
    (-2, 1, 0, 2, 2, -517.0, 1.2, 224.0, -0.6),
    (0, 0, 0, 2, 1, -386.0, -0.4, 200.0, 0.0),
    (0, 0, 1, 2, 2, -301.0, 0.0, 129.0, -0.1),
    (-2, -1, 0, 2, 2, 217.0, -0.5, -95.0, 0.3),
    (-2, 0, 1, 0, 0, -158.0, 0.0, 0.0, 0.0),
    (-2, 0, 0, 2, 1, 129.0, 0.1, -70.0, 0.0),
    (0, 0, -1, 2, 2, 123.0, 0.0, -53.0, 0.0),
    (2, 0, 0, 0, 0, 63.0, 0.0, 0.0, 0.0),
    (0, 0, 1, 0, 1, 63.0, 0.1, -33.0, 0.0),
    (2, 0, -1, 2, 2, -59.0, 0.0, 26.0, 0.0),
    (0, 0, -1, 0, 1, -58.0, -0.1, 32.0, 0.0),
    (0, 0, 1, 2, 1, -51.0, 0.0, 27.0, 0.0),
    (-2, 0, 2, 0, 0, 48.0, 0.0, 0.0, 0.0),
    (0, 0, -2, 2, 1, 46.0, 0.0, -24.0, 0.0),
    (2, 0, 0, 2, 2, -38.0, 0.0, 16.0, 0.0),
    (0, 0, 2, 2, 2, -31.0, 0.0, 13.0, 0.0),
    (0, 0, 2, 0, 0, 29.0, 0.0, 0.0, 0.0),
    (-2, 0, 1, 2, 2, 29.0, 0.0, -12.0, 0.0),
    (0, 0, 0, 2, 0, 26.0, 0.0, 0.0, 0.0),
    (-2, 0, 0, 2, 0, -22.0, 0.0, 0.0, 0.0),
    (0, 0, -1, 2, 1, 21.0, 0.0, -10.0, 0.0),
    (0, 2, 0, 0, 0, 17.0, -0.1, 0.0, 0.0),
    (2, 0, -1, 0, 1, 16.0, 0.0, -8.0, 0.0),
    (-2, 2, 0, 2, 2, -16.0, 0.1, 7.0, 0.0),
    (0, 1, 0, 0, 1, -15.0, 0.0, 9.0, 0.0),
    (-2, 0, 1, 0, 1, -13.0, 0.0, 7.0, 0.0),
    (0, -1, 0, 0, 1, -12.0, 0.0, 6.0, 0.0),
    (0, 0, 2, -2, 0, 11.0, 0.0, 0.0, 0.0),
    (2, 0, -1, 2, 1, -10.0, 0.0, 5.0, 0.0),
    (2, 0, 1, 2, 2, -8.0, 0.0, 3.0, 0.0),
    (0, 1, 0, 2, 2, 7.0, 0.0, -3.0, 0.0),
    (-2, 1, 1, 0, 0, -7.0, 0.0, 0.0, 0.0),
    (0, -1, 0, 2, 2, -7.0, 0.0, 3.0, 0.0),
    (2, 0, 0, 2, 1, -7.0, 0.0, 3.0, 0.0),
    (2, 0, 1, 0, 0, 6.0, 0.0, 0.0, 0.0),
    (-2, 0, 2, 2, 2, 6.0, 0.0, -3.0, 0.0),
    (-2, 0, 1, 2, 1, 6.0, 0.0, -3.0, 0.0),
    (2, 0, -2, 0, 1, -6.0, 0.0, 3.0, 0.0),
    (2, 0, 0, 0, 1, -6.0, 0.0, 3.0, 0.0),
    (0, -1, 1, 0, 0, 5.0, 0.0, 0.0, 0.0),
    (-2, -1, 0, 2, 1, -5.0, 0.0, 3.0, 0.0),
    (-2, 0, 0, 0, 1, -5.0, 0.0, 3.0, 0.0),
    (0, 0, 2, 2, 1, -5.0, 0.0, 3.0, 0.0),
    (-2, 0, 2, 0, 1, 4.0, 0.0, 0.0, 0.0),
    (-2, 1, 0, 2, 1, 4.0, 0.0, 0.0, 0.0),
    (0, 0, 1, -2, 0, 4.0, 0.0, 0.0, 0.0),
    (-1, 0, 1, 0, 0, -4.0, 0.0, 0.0, 0.0),
    (-2, 1, 0, 0, 0, -4.0, 0.0, 0.0, 0.0),
    (1, 0, 0, 0, 0, -4.0, 0.0, 0.0, 0.0),
    (0, 0, 1, 2, 0, 3.0, 0.0, 0.0, 0.0),
    (0, 0, -2, 2, 2, -3.0, 0.0, 0.0, 0.0),
    (-1, -1, 1, 0, 0, -3.0, 0.0, 0.0, 0.0),
    (0, 1, 1, 0, 0, -3.0, 0.0, 0.0, 0.0),
    (0, -1, 1, 2, 2, -3.0, 0.0, 0.0, 0.0),
    (2, -1, -1, 2, 2, -3.0, 0.0, 0.0, 0.0),
    (0, 0, 3, 2, 2, -3.0, 0.0, 0.0, 0.0),
    (2, -1, 0, 2, 2, -3.0, 0.0, 0.0, 0.0))

  /** Nutation in longitude and obliquity (Δψ, Δε) in radians, T in
    * Julian centuries TT from J2000.0. Delaunay fundamental arguments
    * per the IAU 1980 theory (Meeus 22).
    */
  def nutation(t: Double): (Double, Double) = {
    def deg(x: Double): Double = {
      val w = x % 360.0
      (if (w < 0) w + 360.0 else w) * DegRad
    }
    val d = deg(297.85036 + 445267.111480 * t - 0.0019142 * t * t
      + t * t * t / 189474.0)
    val m = deg(357.52772 + 35999.050340 * t - 0.0001603 * t * t
      - t * t * t / 300000.0)
    val mp = deg(134.96298 + 477198.867398 * t + 0.0086972 * t * t
      + t * t * t / 56250.0)
    val f = deg(93.27191 + 483202.017538 * t - 0.0036825 * t * t
      + t * t * t / 327270.0)
    val om = deg(125.04452 - 1934.136261 * t + 0.0020708 * t * t
      + t * t * t / 450000.0)
    var dpsi = 0.0
    var deps = 0.0
    NutTerms.foreach { case (cd, cm, cmp, cf, com, ps, pst, ep, ept) =>
      val arg = cd * d + cm * m + cmp * mp + cf * f + com * om
      dpsi += (ps + pst * t) * math.sin(arg)
      deps += (ep + ept * t) * math.cos(arg)
    }
    (dpsi * 1e-4 * ArcsecRad, deps * 1e-4 * ArcsecRad)
  }

  /** Equatorial nutation offsets for a position (Meeus 23.1):
    * Δα = (cos ε + sin ε sin α tan δ)Δψ − cos α tan δ·Δε
    * Δδ = sin ε cos α·Δψ + sin α·Δε
    */
  def nutateRaDec(ra: Double, dec: Double, dpsi: Double, deps: Double,
                  eps: Double): (Double, Double) = {
    val dRa = (math.cos(eps) + math.sin(eps) * math.sin(ra) *
      math.tan(dec)) * dpsi - math.cos(ra) * math.tan(dec) * deps
    val dDec = math.sin(eps) * math.cos(ra) * dpsi +
      math.sin(ra) * deps
    (dRa, dDec)
  }

  /** Annual aberration offsets (Meeus 23.2, with the e·cos π terms):
    * κ = 20.49552″, solar true longitude from the low-precision solar
    * theory (Meeus 25), eccentricity and perihelion longitude included.
    */
  def aberrationRaDec(ra: Double, dec: Double, t: Double,
                      eps: Double): (Double, Double) = {
    val kappa = 20.49552 * ArcsecRad
    val l0 = (280.46646 + 36000.76983 * t + 0.0003032 * t * t) * DegRad
    val m = (357.52911 + 35999.05029 * t - 0.0001537 * t * t) * DegRad
    val c = ((1.914602 - 0.004817 * t - 0.000014 * t * t) * math.sin(m)
      + (0.019993 - 0.000101 * t) * math.sin(2 * m)
      + 0.000289 * math.sin(3 * m)) * DegRad
    val sun = l0 + c
    val e = 0.016708634 - 0.000042037 * t - 0.0000001267 * t * t
    val pi_ = (102.93735 + 1.71946 * t + 0.00046 * t * t) * DegRad
    val (ca, sa) = (math.cos(ra), math.sin(ra))
    val (cdl, sdl) = (math.cos(dec), math.sin(dec))
    val (ce, te) = (math.cos(eps), math.tan(eps))
    val dRa = -kappa * (ca * math.cos(sun) * ce + sa * math.sin(sun)) /
      cdl + e * kappa * (ca * math.cos(pi_) * ce + sa * math.sin(pi_)) /
      cdl
    val dDec = -kappa * (math.cos(sun) * ce * (te * cdl - sa * sdl) +
      ca * sdl * math.sin(sun)) +
      e * kappa * (math.cos(pi_) * ce * (te * cdl - sa * sdl) +
        ca * sdl * math.sin(pi_))
    (dRa, dDec)
  }

  /** Apparent place from J2000.0 mean place: IAU 1976 precession, then
    * nutation and annual aberration at the epoch.
    */
  def apparentRaDec(raJ2000: Double, decJ2000: Double,
                    jdTt: Double): (Double, Double) = {
    val t = (jdTt - 2451545.0) / 36525.0
    val (raM, decM) = precessRaDec(raJ2000, decJ2000, jdTt)
    val eps = meanObliquityRad(t)
    val (dpsi, deps) = nutation(t)
    val (nRa, nDec) = nutateRaDec(raM, decM, dpsi, deps, eps)
    val (aRa, aDec) = aberrationRaDec(raM, decM, t, eps)
    val ra = raM + nRa + aRa
    (((ra % TwoPi) + TwoPi) % TwoPi, decM + nDec + aDec)
  }

  /** Greenwich APPARENT sidereal time: GMST + equation of the equinoxes
    * Δψ·cos(ε + Δε).
    */
  def gastRad(jdUt1: Double, jdTt: Double): Double = {
    val t = (jdTt - 2451545.0) / 36525.0
    val (dpsi, deps) = nutation(t)
    val eqeq = dpsi * math.cos(meanObliquityRad(t) + deps)
    val g = gmstRad(jdUt1) + eqeq
    ((g % TwoPi) + TwoPi) % TwoPi
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
    val (ra, dec) = precessRaDec(raJ2000, decJ2000, ttJd(unix))
    enhRotateAt(lst - ra, dec, latRad, east, north, height)
  }

  /** Apparent-place variant of [[partUvwAt]]: hour angle from GAST
    * (so nutation enters the sidereal frame too) against the fully
    * apparent — precessed, nutated, aberrated — phase centre.
    *
    * This is the classical IAU-1976/1980 equinox chain, kept for its
    * Meeus worked-example anchors; the production apparent-UVW path is
    * [[Iau2006.partUvwApparent06At]] (frame bias + IAU-2006 precession
    * + IAU-2000B nutation, anchored to the published ERFA check values
    * in Iau2006Spec).
    */
  def partUvwApparentAt(gpsSec: Double, lonRad: Double, latRad: Double,
                        raJ2000: Double, decJ2000: Double,
                        dut1Sec: Double, east: Double, north: Double,
                        height: Double): (Double, Double, Double) = {
    val unix = gpsToUnix(gpsSec)
    val jdUt1 = unixToJd(unix + dut1Sec)
    val jdTt = ttJd(unix)
    val lst = gastRad(jdUt1, jdTt) + lonRad
    val (ra, dec) = apparentRaDec(raJ2000, decJ2000, jdTt)
    enhRotateAt(lst - ra, dec, latRad, east, north, height)
  }

  /** ENH → (u, v, w) rotation at hour angle / declination — shared by
    * the classical and IAU-2006 chains.
    */
  private[functions] def enhRotateAt(ha: Double, dec: Double,
                                     latRad: Double, east: Double,
                                     north: Double, height: Double)
      : (Double, Double, Double) = {
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
