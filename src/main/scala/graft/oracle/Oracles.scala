package graft.oracle

import graft.functions.Num
import graft.ops.{Calibration, GeometryCorrection}

/** Per-query DuckDB oracle SQL. Each entry is the independent SQL twin of
  * a SparkEntry query — same column names, same operand order for every
  * floating-point expression (see OracleSql parity rules).
  */
object Oracles {

  private val compList = (0 until 8).map(k => s"v$k").mkString(", ")

  /** Render a Scala double as a DuckDB DOUBLE literal that parses to the
    * identical binary64 (e-notation forces DOUBLE, 17 sig digits
    * round-trip).
    */
  private def fmt(x: Double): String = f"$x%.17e"

  // ---- sources / selection -------------------------------------------

  val s1VisSynth: String = OracleSql.query(
    s"SELECT t, ant1, ant2, bl, cc, fc, chan, freq_hz, $compList, w FROM vis")

  /** S1b oracle: regenerate the lineage-encoded FITS gpubox fixture
    * (2 coarse channels, 16 announced scans, cc 0 holding only 12
    * image HDUs) from pure range() arithmetic — independent of both
    * the fixture writer and the slab decoder under test. Cell value =
    * cc·1e5 + t·1e4 + blIdx·100 + fc·10 + k (f32-exact integers);
    * missing slabs are zero-filled and flagged (missing-HDU semantics,
    * /root/reference/src/io/mod.rs:297-303).
    */
  val s1bFitsIngest: String = {
    val comps = (0 until 8).map { k =>
      s"       CASE WHEN flag THEN 0.0e0 ELSE cc * 100000.0e0" +
        s" + t * 10000.0e0 + blidx * 100.0e0 + fc * 10.0e0" +
        s" + $k.0e0 END AS v$k"
    }.mkString(",\n")
    s"""SELECT cc, t, ant1, ant2, bl, fc, chan, flag,
       |$comps
       |FROM (
       |  SELECT f.cc, ts.i AS t, p.ant1, p.ant2, p.bl, p.blidx,
       |         ch.i AS fc, CAST(f.cc * 8 + ch.i AS BIGINT) AS chan,
       |         ts.i >= f.present AS flag
       |  FROM (VALUES (CAST(0 AS BIGINT), 12),
       |               (CAST(1 AS BIGINT), 16)) f(cc, present)
       |  CROSS JOIN range(0, 16) ts(i)
       |  CROSS JOIN (SELECT CAST(a1.i AS BIGINT) AS ant1,
       |                     CAST(a2.i AS BIGINT) AS ant2,
       |                     CAST(a1.i * 8 + a2.i AS BIGINT) AS bl,
       |                     row_number()
       |                       OVER (ORDER BY a1.i, a2.i) - 1 AS blidx
       |              FROM range(0, 8) a1(i), range(0, 8) a2(i)
       |              WHERE a1.i <= a2.i) p
       |  CROSS JOIN range(0, 8) ch(i))""".stripMargin
  }

  /** S3 oracle: regenerate the dyadic calsol fixture values from pure
    * range() arithmetic — independent of the MWAOCAL binary round trip
    * under test (8 tiles × 4 chans, formula mirrored in SparkEntry's
    * q_s3_aocal fixture builder).
    */
  val s3Aocal: String = {
    val js = (0 until 8).map(k =>
      s"  CAST(((i // 4) * 64 + (i % 4) * 8 + $k) * 5 % 97 AS DOUBLE)" +
        s" / 32.0e0 - 1.5e0 AS j$k").mkString(",\n")
    s"""SELECT CAST(i // 4 AS BIGINT) AS ant,
       |  CAST(i % 4 AS BIGINT) AS cal_chan,
       |$js
       |FROM range(0, 32) r(i)""".stripMargin
  }

  val p1SelTime: String = OracleSql.query(
    s"SELECT t, bl, chan, $compList, w FROM vis WHERE t BETWEEN 3 AND 12")

  val p2SelAnts: String = OracleSql.query(
    "SELECT t, ant1, ant2, bl, chan FROM vis " +
      "WHERE ant1 IN (0, 1, 2, 4, 5) AND ant2 IN (0, 1, 2, 4, 5)")

  val p3DropFlaggedAnts: String = OracleSql.query(
    """SELECT v.t, v.ant1, v.ant2, v.bl, v.chan FROM vis v
      |WHERE NOT EXISTS (SELECT 1 FROM antenna a
      |                  WHERE a.ant_flagged AND a.ant = v.ant1)
      |  AND NOT EXISTS (SELECT 1 FROM antenna a
      |                  WHERE a.ant_flagged AND a.ant = v.ant2)"""
      .stripMargin)

  val p4NoAutos: String = OracleSql.query(
    "SELECT t, ant1, ant2, bl, chan FROM vis WHERE ant1 <> ant2")

  val p5PicketRanges: String = OracleSql.query(
    """SELECT min(cc) AS cc_min, max(cc) AS cc_max,
      |       count(*) AS n_coarse
      |FROM (SELECT cc, cc - row_number() OVER (ORDER BY cc) AS grp
      |      FROM (SELECT DISTINCT cc FROM vis WHERE cc <> 2))
      |GROUP BY grp""".stripMargin)

  // ---- flags / weights -----------------------------------------------

  val f6SetFlags: String = OracleSql.query(
    "SELECT t, bl, chan, flag FROM vis_flagged",
    OracleSql.visFlaggedCte)

  val f7UnflaggedRanges: String = OracleSql.query(
    """SELECT min(t) AS t_min, max(t) AS t_max
      |FROM (SELECT t, t - row_number() OVER (ORDER BY t) AS grp
      |      FROM (SELECT t FROM vis_flagged GROUP BY t
      |            HAVING min(CAST(flag AS INT)) = 0))
      |GROUP BY grp""".stripMargin,
    OracleSql.visFlaggedCte)

  /** q_f8: QUACKTIM 3.0 s at 2.0 s int-time quacks ceil(3/2) = 2
    * leading timesteps (reference flags.rs:133 takes flag_init from the
    * metafits unvalidated; flags.rs:165-172 flags by time comparison,
    * i.e. ceiling over steps). The `i < 2` literal IS the pin — a
    * floor/round slip in the seconds→steps derivation flips the gate.
    */
  val f8QuackCeiling: String =
    """SELECT CAST(i AS BIGINT) AS t,
      |  1254670392 + CAST(i * 2 AS BIGINT) AS gps_s,
      |  1254670392e0 + i * 2e0 + 1e0 AS centroid_s,
      |  (i < 2 OR i >= 15) AS ts_flag
      |FROM range(0, 16) r(i)""".stripMargin

  val w2Weights: String = OracleSql.queryWeighted(
    "SELECT t, bl, chan, weight FROM vis_weighted")

  // ---- aggregation ---------------------------------------------------

  private val avgBody: String = {
    val comps = (0 until 8).map { k =>
      s"  coalesce(sum(CASE WHEN NOT flag THEN weight * v$k END)" +
        s" / sum(CASE WHEN NOT flag THEN weight END), avg(v$k)) AS a$k"
    }.mkString(",\n")
    s"""SELECT bl, ant1, ant2, CAST(t // 2 AS BIGINT) AS t_out,
       |       CAST(chan // 2 AS BIGINT) AS c_out,
       |$comps,
       |  bool_and(flag) AS flag_out,
       |  coalesce(sum(CASE WHEN NOT flag THEN weight END), 0.0e0)
       |    AS weight_out,
       |  count(*) AS n_samples
       |FROM vis_weighted
       |GROUP BY 1, 2, 3, 4, 5""".stripMargin
  }

  val a1Avg: String = OracleSql.queryWeighted(avgBody)

  // ---- corrections ---------------------------------------------------

  val c1Cable: String = {
    val pols = Seq(
      (0, 1, "(lx2 - lx1)"), (2, 3, "(ly2 - lx1)"),
      (4, 5, "(lx2 - ly1)"), (6, 7, "(ly2 - ly1)"))
    val outs = pols.flatMap { case (ri, ii, dl) =>
      val th = s"-2.0e0 * pi() * $dl * freq_hz / 299792458.0e0"
      Seq(
        s"  CAST(floor((CASE WHEN ant1 = ant2 THEN v$ri ELSE " +
          s"v$ri * cos($th) - v$ii * sin($th) END) * 1.0e6 + 0.5e0) " +
          s"AS BIGINT) AS r$ri",
        s"  CAST(floor((CASE WHEN ant1 = ant2 THEN v$ii ELSE " +
          s"v$ri * sin($th) + v$ii * cos($th) END) * 1.0e6 + 0.5e0) " +
          s"AS BIGINT) AS r$ii")
    }.mkString(",\n")
    OracleSql.query(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM (
         |  SELECT v.*, a1.elec_len_x_m AS lx1, a1.elec_len_y_m AS ly1,
         |         a2.elec_len_x_m AS lx2, a2.elec_len_y_m AS ly2
         |  FROM vis v JOIN antenna a1 ON v.ant1 = a1.ant
         |             JOIN antenna a2 ON v.ant2 = a2.ant)""".stripMargin)
  }

  /** S2b metafits-driven pipeline: static flags → weights → cable →
    * digital gains, the composed chain the parsed-container path runs
    * (reference entry-point-2, /root/reference/src/lib.rs:8-84; stage
    * order preprocessing.rs §kernel order). The SQL recomputes the
    * whole chain from the synthetic dim CTEs; the Spark side runs it
    * on PARSED metafits tables, so the gate is green only if every
    * parsed table (quack timesteps, chan flags, baseline flags, weight
    * factor, electrical lengths, gains) is bit-identical to the dims
    * it mirrors AND the stage composition is right. Micro-unit gate
    * columns (see SparkEntry.microComps).
    */
  val s2bMetafitsPipeline: String = {
    val pols = Seq(
      (0, 1, "(lx2 - lx1)", "(g1x * g2x)"),
      (2, 3, "(ly2 - lx1)", "(g1x * g2y)"),
      (4, 5, "(lx2 - ly1)", "(g1y * g2x)"),
      (6, 7, "(ly2 - ly1)", "(g1y * g2y)"))
    val outs = pols.flatMap { case (ri, ii, dl, g) =>
      val th = s"-2.0e0 * pi() * $dl * freq_hz / 299792458.0e0"
      Seq(
        s"""  CAST(floor((CASE WHEN ant1 = ant2 THEN v$ri
           |    ELSE v$ri * cos($th) - v$ii * sin($th) END) / $g
           |    * 1.0e6 + 0.5e0) AS BIGINT) AS r$ri""".stripMargin,
        s"""  CAST(floor((CASE WHEN ant1 = ant2 THEN v$ii
           |    ELSE v$ri * sin($th) + v$ii * cos($th) END) / $g
           |    * 1.0e6 + 0.5e0) AS BIGINT) AS r$ii""".stripMargin)
    }.mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT t, bl, chan,
         |$outs,
         |  weight
         |FROM (
         |  SELECT v.*, a1.elec_len_x_m AS lx1, a1.elec_len_y_m AS ly1,
         |         a2.elec_len_x_m AS lx2, a2.elec_len_y_m AS ly2,
         |         g1.gain_x AS g1x, g1.gain_y AS g1y,
         |         g2.gain_x AS g2x, g2.gain_y AS g2y
         |  FROM vis_weighted v
         |  JOIN antenna a1 ON v.ant1 = a1.ant
         |  JOIN antenna a2 ON v.ant2 = a2.ant
         |  JOIN digital_gain g1 ON v.ant1 = g1.ant AND v.cc = g1.cc
         |  JOIN digital_gain g2 ON v.ant2 = g2.ant AND v.cc = g2.cc)"""
        .stripMargin)
  }

  /** The (t, ant) partial-UVW dimension CTE — the SQL twin of
    * `GeometryCorrection.partUvw`, shared by the C2 and K2 oracles.
    */
  private val uvwCte: String = {
    import GeometryCorrection._
    val sl = fmt(math.sin(LatRad)); val cl = fmt(math.cos(LatRad))
    val sd = fmt(math.sin(DecRad)); val cd = fmt(math.cos(DecRad))
    val ha = s"(0.5e0 + ts.t * ${fmt(DHa)})"
    s"""uvw AS MATERIALIZED (
       |  SELECT t, ant,
       |         (sh * xc + ch * yc) AS u_m,
       |         ((- $sd) * ch * xc + $sd * sh * yc + $cd * zc) AS v_m,
       |         ($cd * ch * xc - $cd * sh * yc + $sd * zc) AS w_m
       |  FROM (
       |    SELECT ts.t, a.ant,
       |           (- a.north_m) * $sl + a.height_m * $cl AS xc,
       |           a.east_m AS yc,
       |           a.north_m * $cl + a.height_m * $sl AS zc,
       |           sin($ha) AS sh, cos($ha) AS ch
       |    FROM timestep ts CROSS JOIN antenna a))"""
      .stripMargin
  }

  private val c2Body: String = {
    val rot = (0 until 4).flatMap { p =>
      val (ri, ii) = (2 * p, 2 * p + 1)
      Seq(
        s"  CAST(floor((v$ri * cs - v$ii * sn) * 1.0e6 + 0.5e0) " +
          s"AS BIGINT) AS r$ri",
        s"  CAST(floor((v$ri * sn + v$ii * cs) * 1.0e6 + 0.5e0) " +
          s"AS BIGINT) AS r$ii")
    }.mkString(",\n")
    s"""SELECT t, bl, chan,
       |$rot
       |FROM (
       |  SELECT v.*,
       |         cos(-2.0e0 * pi() * (u1.w_m - u2.w_m) * freq_hz
       |             / 299792458.0e0) AS cs,
       |         sin(-2.0e0 * pi() * (u1.w_m - u2.w_m) * freq_hz
       |             / 299792458.0e0) AS sn
       |  FROM vis v
       |  JOIN uvw u1 ON v.t = u1.t AND v.ant1 = u1.ant
       |  JOIN uvw u2 ON v.t = u2.t AND v.ant2 = u2.ant)""".stripMargin
  }

  val c2Geometry: String = OracleSql.query(c2Body, uvwCte)

  /** Apparent-place C2 oracle (`q_c2b_geometry_app`): same rotation
    * body, but the per-(t, ant) w values come from the apparent-UVW
    * chain (frame bias + IAU 2006 precession + IAU 2000B nutation +
    * annual aberration + dut1, `Iau2006.partUvwApparent06At`) at
    * the synthetic observation and inlined as literals. The chain's
    * astronomy is anchored to published worked values in AstroSpec; this
    * gate pins the distributed join + rotation against those fixed
    * ephemeris numbers at 6 dp.
    */
  val c2bGeometryApp: String = {
    import GeometryCorrection._
    val rows = (for {
      t <- 0L until graft.model.Obs.NumTimesteps.toLong
      ant <- 0L until graft.model.Obs.NumAnts.toLong
    } yield {
      val e = (ant % 4) * 100.0 - 150.0
      val n = (ant / 4) * 100.0 - 50.0
      val h = 377.0 + ant * 0.5
      val gps = graft.model.Obs.GpsStart + t * 2
      val (_, _, w) = graft.functions.Iau2006.partUvwApparent06At(
        gps.toDouble + graft.model.Obs.IntTimeS / 2, AppLonRad,
        AppLatRad, AppRaJ2000, AppDecJ2000, AppDut1Sec, e, n, h)
      s"($t, $ant, ${fmt(w)})"
    }).mkString(",\n  ")
    OracleSql.query(c2Body,
      s"uvw AS (SELECT CAST(t AS BIGINT) AS t, CAST(ant AS BIGINT) " +
        s"AS ant, w_m FROM (VALUES\n  $rows) u(t, ant, w_m))")
  }

  /** C2c: the apparent-place UVW table ITSELF, gated in integer
    * nanometres (floor(x·1e9 + 0.5) — 1e-9 m resolution on the full
    * ephemeris chain: GCRS frame bias + IAU-2006 precession + 77-term
    * IAU-2000B nutation + annual aberration + dut1). Fixed-epoch
    * literals pin the driver-computed table; the independent
    * CORRECTNESS anchors for the chain are the published SOFA/ERFA
    * check values in Iau2006Spec (nutation/precession to ~µas, GAST to
    * ~1e-9 rad) and the Meeus worked examples in AstroSpec.
    */
  val c2cApparentUvw: String = {
    import GeometryCorrection._
    val rows = (for {
      t <- 0L until graft.model.Obs.NumTimesteps.toLong
      ant <- 0L until graft.model.Obs.NumAnts.toLong
    } yield {
      val e = (ant % 4) * 100.0 - 150.0
      val n = (ant / 4) * 100.0 - 50.0
      val h = 377.0 + ant * 0.5
      val gps = graft.model.Obs.GpsStart + t * 2
      val (u, v, w) = graft.functions.Iau2006.partUvwApparent06At(
        gps.toDouble + graft.model.Obs.IntTimeS / 2, AppLonRad,
        AppLatRad, AppRaJ2000, AppDecJ2000, AppDut1Sec, e, n, h)
      def nano(x: Double): Long = math.floor(x * 1.0e9 + 0.5).toLong
      s"($t, $ant, ${nano(u)}, ${nano(v)}, ${nano(w)})"
    }).mkString(",\n  ")
    OracleSql.query(
      "SELECT CAST(t AS BIGINT) AS t, CAST(ant AS BIGINT) AS ant,\n" +
        "       CAST(u_n AS BIGINT) AS u_n, CAST(v_n AS BIGINT) AS v_n,\n" +
        "       CAST(w_n AS BIGINT) AS w_n\n" +
        s"FROM (VALUES\n  $rows) u(t, ant, u_n, v_n, w_n)")
  }

  /** C2d: the --pointing-centre UVW twin — the same fixed-epoch
    * apparent-place generator as [[c2cApparentUvw]], evaluated at the
    * synth metafits fixture's RA/DEC tile pointing (30°, −20°) instead
    * of the fixed gate ephemeris. Different centre ⇒ different UVW, so
    * a pointing-centre plumbing bug cannot alias the c2c gate.
    */
  val c2dPointingUvw: String = {
    import GeometryCorrection._
    val (ra, dec) = (math.toRadians(30.0), math.toRadians(-20.0))
    val rows = (for {
      t <- 0L until graft.model.Obs.NumTimesteps.toLong
      ant <- 0L until graft.model.Obs.NumAnts.toLong
    } yield {
      val e = (ant % 4) * 100.0 - 150.0
      val n = (ant / 4) * 100.0 - 50.0
      val h = 377.0 + ant * 0.5
      val gps = graft.model.Obs.GpsStart + t * 2
      val (u, v, w) = graft.functions.Iau2006.partUvwApparent06At(
        gps.toDouble + graft.model.Obs.IntTimeS / 2, AppLonRad,
        AppLatRad, ra, dec, AppDut1Sec, e, n, h)
      def nano(x: Double): Long = math.floor(x * 1.0e9 + 0.5).toLong
      s"($t, $ant, ${nano(u)}, ${nano(v)}, ${nano(w)})"
    }).mkString(",\n  ")
    OracleSql.query(
      "SELECT CAST(t AS BIGINT) AS t, CAST(ant AS BIGINT) AS ant,\n" +
        "       CAST(u_n AS BIGINT) AS u_n, CAST(v_n AS BIGINT) AS v_n,\n" +
        "       CAST(w_n AS BIGINT) AS w_n\n" +
        s"FROM (VALUES\n  $rows) u(t, ant, u_n, v_n, w_n)")
  }

  val c3DigitalGains: String = {
    val pols = Seq(
      (Seq(0, 1), "(g1x * g2x)"), (Seq(2, 3), "(g1x * g2y)"),
      (Seq(4, 5), "(g1y * g2x)"), (Seq(6, 7), "(g1y * g2y)"))
    val outs = pols.flatMap { case (ks, g) =>
      ks.map(k => s"  v$k / $g AS r$k")
    }.mkString(",\n")
    OracleSql.query(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM (
         |  SELECT v.*, g1.gain_x AS g1x, g1.gain_y AS g1y,
         |         g2.gain_x AS g2x, g2.gain_y AS g2y
         |  FROM vis v
         |  JOIN digital_gain g1 ON v.ant1 = g1.ant AND v.cc = g1.cc
         |  JOIN digital_gain g2 ON v.ant2 = g2.ant AND v.cc = g2.cc)"""
        .stripMargin)
  }

  val c4Passband: String = {
    val outs = (0 until 8).map(k => s"  v$k / pfb_gain AS r$k")
      .mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT t, bl, chan,
         |$outs,
         |  weight * pfb_gain AS weight_pfb
         |FROM vis_weighted v JOIN pfb_gain p ON v.fc = p.fc""".stripMargin)
  }

  /** C4 against a PUBLISHED gain table: the 8 scrunched values are
    * inlined as string-cast literals (`Double.toString` round-trips
    * exactly, and CAST('…' AS DOUBLE) keeps DuckDB off DECIMAL), so the
    * oracle gates the application join + divide/multiply on the REAL
    * constants; the scrunch that produced them is gated separately by
    * the golden tests vs the reference's own cases
    * (/root/reference/src/corrections.rs:1448-1533).
    */
  def c4PassbandReal(gains: Array[Double]): String = {
    val values = gains.zipWithIndex.map { case (g, i) =>
      s"(CAST($i AS BIGINT), CAST('$g' AS DOUBLE))"
    }.mkString(", ")
    val outs = (0 until 8).map(k => s"  v$k / pfb_gain AS r$k")
      .mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT t, bl, chan,
         |$outs,
         |  weight * pfb_gain AS weight_pfb
         |FROM vis_weighted v JOIN pfb_real p ON v.fc = p.fc""".stripMargin,
      s"pfb_real AS (SELECT * FROM (VALUES $values) t(fc, pfb_gain))")
  }

  val c6Calibration: String = {
    val j1 = (0 until 8).map(k => s"j${k}_1")
    val v = (0 until 8).map(k => s"v$k")
    val j2 = (0 until 8).map(k => s"j${k}_2")
    val comps = Calibration.sandwich(j1, v, j2)(Num.sqlNum)
    val outs = comps.zipWithIndex
      .map { case (e, k) => s"  $e AS r$k" }.mkString(",\n")
    val jsel1 = (0 until 8).map(k => s"c1.j$k AS j${k}_1").mkString(", ")
    val jsel2 = (0 until 8).map(k => s"c2.j$k AS j${k}_2").mkString(", ")
    OracleSql.query(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM (
         |  SELECT v.*, $jsel1, $jsel2
         |  FROM vis v
         |  JOIN calsol c1 ON v.ant1 = c1.ant AND v.cc = c1.cc
         |  JOIN calsol c2 ON v.ant2 = c2.ant AND v.cc = c2.cc)"""
        .stripMargin)
  }

  /** C6b: calibration solutions from the MWAOCAL BINARY file — the
    * reference's production flow (AOCalSols::read_andre_binary then
    * apply_di_calsol, /root/reference/src/calibration.rs:41-131). The
    * Spark side reads the fixture file through the binary reader and
    * applies the sandwich; this twin regenerates the fixture's dyadic
    * Jones values from pure range() arithmetic, independent of the
    * reader under test (same independence pattern as q_s3).
    */
  val c6bCalibrationAocal: String = {
    val j1 = (0 until 8).map(k => s"j${k}_1")
    val v = (0 until 8).map(k => s"v$k")
    val j2 = (0 until 8).map(k => s"j${k}_2")
    val comps = Calibration.sandwich(j1, v, j2)(Num.sqlNum)
    val outs = comps.zipWithIndex
      .map { case (e, k) => s"  $e AS r$k" }.mkString(",\n")
    val jsel1 = (0 until 8).map(k => s"c1.j$k AS j${k}_1").mkString(", ")
    val jsel2 = (0 until 8).map(k => s"c2.j$k AS j${k}_2").mkString(", ")
    val jDefs = (0 until 8).map { k =>
      s"         CAST(((i // 4) * 64 + (i % 4) * 8 + $k) * 5 % 97" +
        s" AS DOUBLE) / 32.0e0 - 1.5e0 AS j$k"
    }.mkString(",\n")
    val aocalCte =
      s"""aocal AS (
         |  SELECT CAST(i // 4 AS BIGINT) AS ant,
         |         CAST(i % 4 AS BIGINT) AS cc,
         |$jDefs
         |  FROM range(0, 32) r(i))""".stripMargin
    OracleSql.query(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM (
         |  SELECT v.*, $jsel1, $jsel2
         |  FROM vis v
         |  JOIN aocal c1 ON v.ant1 = c1.ant AND v.cc = c1.cc
         |  JOIN aocal c2 ON v.ant2 = c2.ant AND v.cc = c2.cc)"""
        .stripMargin,
      aocalCte)
  }

  // ---- Van Vleck (C5) ------------------------------------------------

  /** Auto-kernel oracle: the reference's published σ̂/σ/σ̂′ vectors
    * (van_vleck.rs:400-465) as a VALUES relation; Spark recomputes each
    * column with the live kernel (graft.ops.VanVleck.sigmaParity). DuckDB
    * has no erf, so the forward model is not SQL-expressible — the public
    * vectors ARE the independent ground truth here.
    */
  val c5Sigma: String = {
    import graft.functions.VanVleckVectors._
    val rows = sighats.indices.map { i =>
      s"  (${i}, ${fmt(sigmas(i))}, ${fmt(sighats(i))}, " +
        s"${fmt(sighatsPrime(i))})"
    }.mkString(",\n")
    s"""SELECT CAST(idx AS BIGINT) AS idx,
       |       round(sigma_rec, 6) AS sigma_rec,
       |       round(sighat_fwd, 6) AS sighat_fwd,
       |       round(prime_fwd, 6) AS prime_fwd
       |FROM (VALUES
       |$rows) t(idx, sigma_rec, sighat_fwd, prime_fwd)""".stripMargin
  }

  /** Cross-kernel oracle: a full DuckDB twin of `vanVleckCrossInt`
    * (van_vleck.rs:703-748) — Newton iteration as a recursive CTE over the
    * DISTINCT (khat, σx, σy) triples, with Simpson's rule (n=10) and the
    * 7×7 bivariate-normal grid pdf as nested list-lambda sums
    * (cosh spelled as paired exps; DuckDB has no cosh). Triples re-join the
    * cell table at the end; non-invertible seeds (ρ∉[0,1)) fall back to
    * khat via the LEFT JOIN coalesce, mirroring the kernel's guard.
    */
  // sequential left fold (0.0 + t0 + t1 + …): the exact accumulation
  // order of the Scala kernel's while-loops, so kernel and oracle agree
  // to the last ulp — list_sum's order is an implementation detail,
  // list_reduce over a prepended 0.0 is contractually sequential
  private def c5FoldSum(l: String): String =
    s"list_reduce(list_prepend(CAST(0.0e0 AS DOUBLE), $l), " +
      "(acc, x) -> acc + x)"

  // pdf(x_, y_, rho) with x_i=(i+0.5)/sx, y_k=(k+0.5)/sy as a 49-term
  // lambda sum; `rho` is a SQL expression in scope (sx, sy row columns).
  // Row-major ij order and cosh-as-paired-exps match
  // graft.functions.VanVleckKernel.pdf operation-for-operation.
  private def c5PdfSql(rho: String): String = {
    val d = s"greatest(1.0e0 - ($rho)*($rho), 1.0e-20)"
    val xi = "((CAST(ij//7 AS DOUBLE)+0.5e0)/sx)"
    val yk = "((CAST(ij%7 AS DOUBLE)+0.5e0)/sy)"
    val a = s"($xi * $yk * ($rho) / $d)"
    val b = s"(($xi*$xi + $yk*$yk) / (2.0e0*$d))"
    s"(${c5FoldSum(s"list_transform(range(0, 49), ij -> " +
      s"exp($a - $b) + exp(-$a - $b))")} / (pi() * sqrt($d)))"
  }

  // Simpson ∫_0^rho pdf dζ, n=10: weights 1,4,2,…,4,1 over si=0..10,
  // accumulated in ascending si order like the kernel's loop.
  private def c5SimpSql(rho: String): String = {
    val h = s"(($rho)/10.0e0)"
    val w = "(CASE WHEN si = 0 OR si = 10 THEN 1.0e0 " +
      "WHEN si % 2 = 1 THEN 4.0e0 ELSE 2.0e0 END)"
    s"(${c5FoldSum(s"list_transform(range(0, 11), si -> " +
      s"$w * ${c5PdfSql(s"CAST(si AS DOUBLE) * $h")})")} * $h / 3.0e0)"
  }

  /** Newton-inversion CTE pair over a `tri(khat, sx, sy)` relation —
    * the recursive `vanVleckCrossInt` twin shared by `c5Cross` and
    * `c5Pipeline`.
    */
  private def c5NewtonCte: String =
    s"""newton(khat, sx, sy, sgn, k, guess, delta, cnt) AS (
       |  SELECT khat, sx, sy, sign(khat), abs(khat),
       |         abs(khat)/(sx*sy),
       |         ${c5SimpSql("abs(khat)/(sx*sy)")} - abs(khat), 0
       |  FROM tri
       |  WHERE abs(khat)/(sx*sy) >= 0.0e0 AND abs(khat)/(sx*sy) < 1.0e0
       |  UNION ALL
       |  SELECT khat, sx, sy, sgn, k, g2,
       |         ${c5SimpSql("g2")} - k, cnt + 1
       |  FROM (SELECT *, guess - delta / ${c5PdfSql("guess")} AS g2
       |        FROM newton
       |        WHERE abs(delta) > 1.0e-12 AND cnt <= 100)
       |  -- escape guard, mirrored from the kernel: an iterate outside
       |  -- [0,1) stops extending, so the triple's max-cnt row keeps
       |  -- |δ|>tol and vvres falls back to khat — and every pdf the
       |  -- recursion ever evaluates stays in the finite regime where
       |  -- engines agree to the last ulp
       |  WHERE g2 >= 0.0e0 AND g2 < 1.0e0)""".stripMargin

  private def c5VvresCte: String =
    """vvres AS MATERIALIZED (
      |  SELECT khat, sx, sy,
      |         -- cnt <= 100: the kernel's reference cap policy
      |         -- (van_vleck.rs:723-730) abandons to khat after the
      |         -- 101st Newton step WITHOUT re-checking the residual,
      |         -- so a cnt=101 row is khat even when |δ| converged
      |              CASE WHEN cnt <= 100 AND abs(delta) <= 1.0e-12
      |              THEN sgn * guess * sx * sy
      |              ELSE khat END AS kappa
      |  FROM (SELECT *, row_number() OVER (PARTITION BY khat, sx, sy
      |                                     ORDER BY cnt DESC) AS rn
      |        FROM newton)
      |  WHERE rn = 1)""".stripMargin

  val c5Cross: String = {
    val crossIn =
      """cross_in AS (
        |  SELECT t, bl, chan, v0 / 16.0e0 AS khat,
        |         1.0e0 + CAST((ant1 * 19 + chan * 7) % 64 AS DOUBLE)
        |           / 128.0e0 AS sx,
        |         1.0e0 + CAST((ant2 * 23 + chan * 11) % 64 AS DOUBLE)
        |           / 128.0e0 AS sy
        |  FROM vis WHERE ant1 <> ant2 AND t < 8 AND chan < 4),
        |tri AS (SELECT DISTINCT khat, sx, sy FROM cross_in)""".stripMargin
    OracleSql.queryRecursive(
      """SELECT c.t, c.bl, c.chan, c.khat, c.sx, c.sy,
        |       CAST(floor(coalesce(r.kappa, c.khat) * 1.0e6 + 0.5e0)
        |            AS BIGINT) AS kappa_u
        |FROM cross_in c LEFT JOIN vvres r
        |  ON c.khat = r.khat AND c.sx = r.sx AND c.sy = r.sy"""
        .stripMargin,
      crossIn, c5NewtonCte, c5VvresCte)
  }

  /** Full-dataflow C5 oracle (`q_c5_pipeline`): the REAL σ table feeds
    * the σ-join + per-pol pairing of `VanVleck.apply` on a bounded
    * window (t<4 ∧ chan<2, sampleScale 2, ant 7 flagged).
    *
    * DuckDB has no erf, so the one non-SQL-expressible step — σ̂→σ
    * Newton inversion — enters as a STATIC 1037-row map: VisSynth autos
    * are dyadic with |v| ∈ {m/128, m=0..1036}, so the map enumerates
    * every possible max|v| input and holds the live kernel's σ for it.
    * The kernel itself is independently gated against the reference's
    * published vectors (`q_c5_sigma`), so the map adds no circularity
    * beyond that anchor. Everything else — max-abs σ aggregation, the
    * double σ join, XX/XY/YX/YY σ pairing (van_vleck.rs:273-280), auto
    * replacement (σ², zeroed imag, XY cross + conjugate YX,
    * van_vleck.rs:232-260), flagged-antenna passthrough, and the
    * Newton+Simpson cross inversion — is genuine SQL.
    */
  val c5Pipeline: String = c5Dataflow("t < 4 AND chan < 2")

  /** Full-frame twin (`q_c5_van_vleck`): the SAME dataflow oracle with
    * no window — valid because the σ̂ map's dyadic domain (m/128,
    * m ≤ 1036) covers the synthetic frame's entire auto range
    * (max |v| = 1036/128 at every SF, verified against the vis oracle).
    * The recursive Newton CTE then runs over every distinct kernel
    * triple of the frame (~45 s in DuckDB at sf0.01 — a one-shot gate
    * cost, not a Spark cost).
    */
  val c5VanVleck: String = c5Dataflow("TRUE")

  /** The C5 dataflow as composable CTE layers: returns (ctes, outRel)
    * where outRel holds one row per `vis` row in `winWhere` with every
    * vis column plus the RAW Van-Vleck-corrected components c0..c7 —
    * the form the composed-preprocess twin (`ppChain`) chains further
    * stages onto. `c5Dataflow` quantises the same doubles to
    * micro-units for the standalone C5 gates.
    */
  private def c5RawCtes(winWhere: String): (Seq[String], String) = {
    val scale = "2.0e0"
    val smapRows = (0 to 1036).map { m =>
      val p = m / 128.0
      val sig = graft.functions.VanVleckKernel
        .vanVleckAuto(math.sqrt(p / 2.0))
      s"(${fmt(p)}, ${fmt(sig)})"
    }.mkString(",\n  ")
    val smap = s"smap AS MATERIALIZED (SELECT * FROM (VALUES\n  $smapRows) m(p, sg))"
    val win = s"win AS MATERIALIZED (SELECT * FROM vis WHERE $winWhere)"
    val sig =
      """sig AS MATERIALIZED (
        |  SELECT a.t, a.ant, a.chan, mx.sg AS sigma_x, my.sg AS sigma_y
        |  FROM (SELECT t, ant1 AS ant, chan,
        |               max(abs(v0)) AS pxx, max(abs(v6)) AS pyy
        |        FROM win WHERE ant1 = ant2 AND ant1 <> 7
        |        GROUP BY 1, 2, 3) a
        |  JOIN smap mx ON a.pxx = mx.p
        |  JOIN smap my ON a.pyy = my.p)""".stripMargin
    val joined =
      """joined AS MATERIALIZED (
        |  SELECT w.*, s1.sigma_x AS sx1, s1.sigma_y AS sy1,
        |         s2.sigma_x AS sx2, s2.sigma_y AS sy2
        |  FROM win w
        |  LEFT JOIN sig s1
        |    ON w.t = s1.t AND w.ant1 = s1.ant AND w.chan = s1.chan
        |  LEFT JOIN sig s2
        |    ON w.t = s2.t AND w.ant2 = s2.ant AND w.chan = s2.chan)"""
        .stripMargin
    // per-component kernel inputs: khat and the (σa, σb) pairing —
    // crosses pair XX:(sx1,sx2) XY:(sx1,sy2) YX:(sy1,sx2) YY:(sy1,sy2);
    // autos run the kernel only for XY (components 2,3 — and 4,5 reuse
    // 2,3's κ for the conjugate), always with (sx1, sy1)
    val crossPair = Seq(
      0 -> ("sx1", "sx2"), 1 -> ("sx1", "sx2"),
      2 -> ("sx1", "sy2"), 3 -> ("sx1", "sy2"),
      4 -> ("sy1", "sx2"), 5 -> ("sy1", "sx2"),
      6 -> ("sy1", "sy2"), 7 -> ("sy1", "sy2"))
    val keyCols = crossPair.map { case (j, (sa, sb)) =>
      val autoSrc = j match {
        case 2 | 3 => s"v$j / $scale"
        case 4 => s"v2 / $scale"
        case 5 => s"v3 / $scale"
        case _ => "NULL"
      }
      s"""CASE WHEN sx1 IS NULL OR sx2 IS NULL THEN NULL
         |     WHEN ant1 = ant2 THEN $autoSrc
         |     ELSE v$j / $scale END AS kh$j,
         |CASE WHEN ant1 = ant2 THEN sx1 ELSE $sa END AS sa$j,
         |CASE WHEN ant1 = ant2 THEN sy1 ELSE $sb END AS sb$j"""
        .stripMargin
    }.mkString(",\n")
    val keys = s"keys AS MATERIALIZED (\n  SELECT *,\n$keyCols\n  FROM joined)"
    val triUnion = (0 until 8).map(j =>
      s"SELECT kh$j AS khat, sa$j AS sx, sb$j AS sy FROM keys " +
        s"WHERE kh$j IS NOT NULL").mkString("\n  UNION ALL\n  ")
    val tri = s"tri AS MATERIALIZED (\n  SELECT DISTINCT khat, sx, sy FROM (\n  " +
      triUnion + "))"
    val kJoins = (0 until 8).map(j =>
      s"LEFT JOIN vvres k$j ON kh$j = k$j.khat AND sa$j = k$j.sx " +
        s"AND sb$j = k$j.sy").mkString("\n")
    val outs = crossPair.map { case (j, _) =>
      val cross = s"$scale * coalesce(k$j.kappa, kh$j)"
      val auto = j match {
        case 0 => s"$scale * sx1 * sx1"
        case 6 => s"$scale * sy1 * sy1"
        case 1 | 7 => "0.0e0"
        case 5 => s"-($scale * coalesce(k5.kappa, kh5))"
        case _ => s"$scale * coalesce(k$j.kappa, kh$j)"
      }
      s"""         (CASE WHEN sx1 IS NULL OR sx2 IS NULL THEN v$j
         |               WHEN ant1 = ant2 THEN $auto
         |               ELSE $cross END) AS c$j""".stripMargin
    }.mkString(",\n")
    val vvraw =
      s"""vvraw AS MATERIALIZED (
         |  SELECT t, ant1, ant2, bl, cc, fc, chan, freq_hz, w,
         |$outs
         |  FROM keys
         |$kJoins)""".stripMargin
    (Seq(smap, win, sig, joined, keys, tri, c5NewtonCte, c5VvresCte,
      vvraw), "vvraw")
  }

  private def c5Dataflow(winWhere: String): String = {
    val (ctes, rel) = c5RawCtes(winWhere)
    val outs = (0 until 8).map(j =>
      s"  CAST(floor(c$j * 1.0e6 + 0.5e0) AS BIGINT) AS r$j")
      .mkString(",\n")
    OracleSql.queryRecursive(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM $rel""".stripMargin,
      ctes: _*)
  }

  // ---- full composed preprocess (PP) ---------------------------------

  /** The COMPLETE preprocess chain twin — every stage of the
    * reference's fixed order (preprocessing.rs:178-361) composed in one
    * query: static flags → weights → Van Vleck → cable → digital
    * gains → passband → RFI (default strategy, flag-OR) → geometry →
    * DI calibration (incl. NaN flag/weight bake). Raw doubles chain
    * between stages exactly as Spark's fused projection computes them
    * (each stage's expression tree is the per-stage twin's, already
    * hash-proven individually); quantisation happens ONCE at the end
    * (micro-units for the comps, 112-units for the weight — weight =
    * ±w·8·pfb_gain with pfb_gain = k/112, so weight·112 is an exact
    * integer).
    *
    * `skipCableGeom` renders the chain WITHOUT the cable and geometry
    * layers — the metafits CABLEDEL/GEODEL ≠ 0 auto-skip variant
    * (reference CLI decisions, cli.rs:1389-1399, 1444-1452).
    */
  private def ppCtes(skipCableGeom: Boolean): (Seq[String], String) = {
    val (vvCtes, vvRel) = c5RawCtes("TRUE")
    // static flags + weight bake (flags.rs:217-221, 579-584) on the
    // Van-Vleck-corrected rows — VV reads only the payload comps, so
    // correcting first ≡ the engine's weighted-then-VV composition
    val ppw =
      s"""ppw AS MATERIALIZED (
         |  SELECT v.t, v.ant1, v.ant2, v.bl, v.cc, v.fc, v.chan,
         |         v.freq_hz, v.w,
         |         v.c0, v.c1, v.c2, v.c3, v.c4, v.c5, v.c6, v.c7,
         |         (ts.ts_flag OR c.ch_flag OR b.bl_flag) AS flag,
         |         CASE WHEN (ts.ts_flag OR c.ch_flag OR b.bl_flag)
         |              THEN -(v.w * 8.0e0) ELSE v.w * 8.0e0 END AS weight
         |  FROM $vvRel v
         |  JOIN timestep ts ON v.t = ts.t
         |  JOIN chan c ON v.chan = c.chan
         |  JOIN baseline b ON v.bl = b.bl)""".stripMargin
    val carry = "t, ant1, ant2, bl, cc, fc, chan, freq_hz, flag, weight"
    // cable (C1): guarded per-pol rotation, autos pass through exactly
    val cbPols = Seq(
      (0, 1, "(lx2 - lx1)"), (2, 3, "(ly2 - lx1)"),
      (4, 5, "(lx2 - ly1)"), (6, 7, "(ly2 - ly1)"))
    val cbOuts = cbPols.flatMap { case (ri, ii, dl) =>
      val th = s"-2.0e0 * pi() * $dl * freq_hz / 299792458.0e0"
      Seq(
        s"         CASE WHEN ant1 = ant2 THEN c$ri ELSE " +
          s"c$ri * cos($th) - c$ii * sin($th) END AS c$ri",
        s"         CASE WHEN ant1 = ant2 THEN c$ii ELSE " +
          s"c$ri * sin($th) + c$ii * cos($th) END AS c$ii")
    }.mkString(",\n")
    val cb =
      s"""cb AS MATERIALIZED (
         |  SELECT $carry,
         |$cbOuts
         |  FROM (
         |    SELECT v.*, a1.elec_len_x_m AS lx1, a1.elec_len_y_m AS ly1,
         |           a2.elec_len_x_m AS lx2, a2.elec_len_y_m AS ly2
         |    FROM ppw v JOIN antenna a1 ON v.ant1 = a1.ant
         |               JOIN antenna a2 ON v.ant2 = a2.ant))"""
        .stripMargin
    // digital gains (C3)
    val dgSrc = if (skipCableGeom) "ppw" else "cb"
    val dgPols = Seq(
      (Seq(0, 1), "(g1x * g2x)"), (Seq(2, 3), "(g1x * g2y)"),
      (Seq(4, 5), "(g1y * g2x)"), (Seq(6, 7), "(g1y * g2y)"))
    val dgOuts = dgPols.flatMap { case (ks, g) =>
      ks.map(k => s"         c$k / $g AS c$k")
    }.mkString(",\n")
    val dg =
      s"""dg AS MATERIALIZED (
         |  SELECT $carry,
         |$dgOuts
         |  FROM (
         |    SELECT v.*, g1.gain_x AS g1x, g1.gain_y AS g1y,
         |           g2.gain_x AS g2x, g2.gain_y AS g2y
         |    FROM $dgSrc v
         |    JOIN digital_gain g1 ON v.ant1 = g1.ant AND v.cc = g1.cc
         |    JOIN digital_gain g2 ON v.ant2 = g2.ant AND v.cc = g2.cc))"""
        .stripMargin
    // passband (C4): vis /= gain, weight *= gain
    val pbOuts = (0 until 8)
      .map(k => s"         c$k / pfb_gain AS c$k").mkString(",\n")
    val pb =
      s"""pb AS MATERIALIZED (
         |  SELECT v.t, v.ant1, v.ant2, v.bl, v.cc, v.fc, v.chan,
         |         v.freq_hz, v.flag,
         |$pbOuts,
         |         weight * pfb_gain AS weight
         |  FROM dg v JOIN pfb_gain p ON v.fc = p.fc)""".stripMargin
    // RFI (default strategy on the post-passband XX image), flag-OR
    val (rfiCtes, rfiLast) = r1ChainCtes("pb",
      "sqrt(c0 * c0 + c1 * c1)", 6.0, 1.0, 1.0)
    val rfidet =
      s"""rfidet AS MATERIALIZED (
         |  SELECT bl, t, chan, flg FROM $rfiLast WHERE seen)"""
        .stripMargin
    val compCols = (0 until 8).map(k => s"c$k").mkString(", ")
    val ppr =
      s"""ppr AS MATERIALIZED (
         |  SELECT p.t, p.ant1, p.ant2, p.bl, p.cc, p.fc, p.chan,
         |         p.freq_hz, p.weight, $compCols,
         |         (p.flag OR coalesce(r.flg, FALSE)) AS flag
         |  FROM pb p LEFT JOIN rfidet r
         |    ON p.bl = r.bl AND p.t = r.t AND p.chan = r.chan)"""
        .stripMargin
    // geometry (C2): phase-track rotation from the partial-UVW table
    val geoOuts = (0 until 4).flatMap { p =>
      val (ri, ii) = (2 * p, 2 * p + 1)
      Seq(s"         (c$ri * cs - c$ii * sn) AS c$ri",
        s"         (c$ri * sn + c$ii * cs) AS c$ii")
    }.mkString(",\n")
    val geo =
      s"""geo AS MATERIALIZED (
         |  SELECT $carry,
         |$geoOuts
         |  FROM (
         |    SELECT v.*,
         |           cos(-2.0e0 * pi() * (u1.w_m - u2.w_m) * freq_hz
         |               / 299792458.0e0) AS cs,
         |           sin(-2.0e0 * pi() * (u1.w_m - u2.w_m) * freq_hz
         |               / 299792458.0e0) AS sn
         |    FROM ppr v
         |    JOIN uvw u1 ON v.t = u1.t AND v.ant1 = u1.ant
         |    JOIN uvw u2 ON v.t = u2.t AND v.ant2 = u2.ant))"""
        .stripMargin
    // DI calibration (C6): J1 · V · J2^H + NaN flag/weight bake
    // (calibration.rs:111-124)
    val calSrc = if (skipCableGeom) "ppr" else "geo"
    val j1 = (0 until 8).map(k => s"j${k}_1")
    val vIn = (0 until 8).map(k => s"c$k")
    val j2 = (0 until 8).map(k => s"j${k}_2")
    val sand = Calibration.sandwich(j1, vIn, j2)(Num.sqlNum)
    val calOuts = sand.zipWithIndex
      .map { case (e, k) => s"         $e AS c$k" }.mkString(",\n")
    val jsel1 = (0 until 8).map(k => s"c1.j$k AS j${k}_1").mkString(", ")
    val jsel2 = (0 until 8).map(k => s"c2.j$k AS j${k}_2").mkString(", ")
    val calRaw =
      s"""calraw AS MATERIALIZED (
         |  SELECT $carry,
         |$calOuts
         |  FROM (
         |    SELECT v.*, $jsel1, $jsel2
         |    FROM $calSrc v
         |    JOIN calsol c1 ON v.ant1 = c1.ant AND v.cc = c1.cc
         |    JOIN calsol c2 ON v.ant2 = c2.ant AND v.cc = c2.cc))"""
        .stripMargin
    val anyNan = (0 until 8).map(k => s"isnan(c$k)").mkString(" OR ")
    val cal =
      s"""cal AS MATERIALIZED (
         |  SELECT t, ant1, ant2, bl, cc, fc, chan, freq_hz, $compCols,
         |         (flag OR ($anyNan)) AS flag,
         |         CASE WHEN $anyNan THEN -abs(weight) ELSE weight END
         |           AS weight
         |  FROM calraw)""".stripMargin
    val ctes = vvCtes ++ Seq(ppw) ++
      (if (skipCableGeom) Nil else Seq(cb)) ++ Seq(dg, pb) ++
      rfiCtes ++ Seq(rfidet, ppr) ++
      (if (skipCableGeom) Nil else Seq(uvwCte, geo)) ++
      Seq(calRaw, cal)
    (ctes, "cal")
  }

  private def ppQuery(skipCableGeom: Boolean): String = {
    val (ctes, rel) = ppCtes(skipCableGeom)
    val outs = (0 until 8).map(j =>
      s"  CAST(floor(c$j * 1.0e6 + 0.5e0) AS BIGINT) AS r$j")
      .mkString(",\n")
    OracleSql.queryRecursive(
      s"""SELECT t, bl, chan,
         |$outs,
         |  flag,
         |  CAST(floor(weight * 112.0e0 + 0.5e0) AS BIGINT) AS w112
         |FROM $rel""".stripMargin,
      ctes: _*)
  }

  /** q_pp_full_preprocess: the composed chain with EVERY stage on. */
  val ppFullPreprocess: String = ppQuery(skipCableGeom = false)

  /** q_pp2_preprocess_skips: the CABLEDEL/GEODEL auto-skip variant —
    * the metafits says cable and geometric delays were applied
    * upstream, so those two stages must NOT run (running them anyway
    * would double-correct and flip every hash).
    */
  val ppPreprocessSkips: String = ppQuery(skipCableGeom = true)

  /** q_pp3_preprocess_avg: the composed chain feeding the REAL
    * averaging operator. The corrected comps/weight quantise to exact
    * integer-valued doubles FIRST (micro-units / 112-units — the
    * chain's outputs are transcendental, and a weighted mean of raw
    * doubles would be partial-aggregation-order dependent across
    * engines); the weighted-mean arithmetic over those integers is
    * then exact in both engines up to one final correctly-rounded
    * division, so the gate hashes the averaging operator's RAW output.
    */
  val ppPreprocessAvg: String = {
    val (ctes, rel) = ppCtes(skipCableGeom = false)
    val qCols = (0 until 8)
      .map(k => s"         floor(c$k * 1.0e6 + 0.5e0) AS q$k")
      .mkString(",\n")
    val ppq =
      s"""ppq AS MATERIALIZED (
         |  SELECT bl, ant1, ant2, t, chan, flag,
         |         floor(weight * 112.0e0 + 0.5e0) AS qw,
         |$qCols
         |  FROM $rel)""".stripMargin
    val aggs = (0 until 8).map { k =>
      s"  coalesce(sum(CASE WHEN NOT flag THEN qw * q$k END)" +
        s" / sum(CASE WHEN NOT flag THEN qw END), avg(q$k)) AS a$k"
    }.mkString(",\n")
    OracleSql.queryRecursive(
      s"""SELECT bl, ant1, ant2, CAST(t // 2 AS BIGINT) AS t_out,
         |       CAST(chan // 2 AS BIGINT) AS c_out,
         |$aggs,
         |  bool_and(flag) AS flag_out,
         |  coalesce(sum(CASE WHEN NOT flag THEN qw END), 0.0e0)
         |    AS weight_out,
         |  count(*) AS n_samples
         |FROM ppq
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
      (ctes :+ ppq): _*)
  }

  // ---- RFI -----------------------------------------------------------

  /** SumThreshold oracle: a window-SQL twin of the full
    * `SumThresholdKernel.flagMatrix` dataflow (graft.ops.RfiFlag).
    *
    * Per baseline: densify to the (distinct t × distinct chan) grid
    * (missing cells amp=0, unflagged — they participate in passes but are
    * excluded from output, mirroring the kernel's `seen` mask), subtract
    * the upper-median background of unflagged cells, derive χ₁ = 6·1.4826·
    * MAD from the SEEN unflagged cells, then run the M=1,2,…,32 passes.
    * Each `pass1d` is two window ops: a length-M forward window sum where
    * flagged cells contribute χ (ROWS CURRENT..M-1 FOLLOWING), and a
    * backward `bool_or` spreading each exceeding window onto all M cells
    * it covers (ROWS M-1 PRECEDING..CURRENT). Time pass reads the previous
    * scale's flags; the same-scale frequency pass reads the time pass's
    * output — 12 sequential CTE layers, exactly the kernel's update order.
    * χ divisors are the 1.5^l literals (JDK pow is exact for these).
    */
  /** Parameterised SumThreshold twin: amplitude image (which pol), MAD
    * multiplier, and per-direction sensitivities — the strategy knobs
    * `RfiStrategy` exposes. The kernel computes each pass threshold as
    * one division χ1 / (ρ^l · weight), so a single SQL literal holding
    * ρ^l·weight (computed here in the same double arithmetic)
    * reproduces it bit-for-bit.
    */
  /** SIR twin: the scale-invariant rank extension (graft.functions
    * .SirKernel) as three exact-integer window ops per direction —
    * inclusive prefix sum P of the fixed-point weights (flagged ⇒ ηN,
    * else ηN − 1000), suffix max of P, strict-prefix min of P capped
    * at 0 — flagging where max_{j≥i} P(j) ≥ min(0, min_{j<i} P(j)).
    * All BIGINT arithmetic, so this layer is bit-identical to the
    * kernel by construction. η = 0 renders no layer (exact identity
    * on both sides).
    */
  private def sirPass(prev: String, cur: String, part: String,
                      ord: String, etaNum: Long): String =
    s"""$cur AS MATERIALIZED (
       |  SELECT bl, t, chan, seen, res, chi1,
       |         (sirmax >= least(CAST(0 AS BIGINT),
       |                          coalesce(sirminpre, CAST(0 AS BIGINT))))
       |           AS flg
       |  FROM (
       |    SELECT *,
       |           max(sirp) OVER (PARTITION BY $part ORDER BY $ord
       |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |             AS sirmax,
       |           min(sirp) OVER (PARTITION BY $part ORDER BY $ord
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |             AS sirminpre
       |    FROM (
       |      SELECT *,
       |             sum(CASE WHEN flg THEN CAST($etaNum AS BIGINT)
       |                 ELSE CAST(${etaNum - 1000L} AS BIGINT) END)
       |               OVER (PARTITION BY $part ORDER BY $ord
       |                     ROWS BETWEEN UNBOUNDED PRECEDING
       |                     AND CURRENT ROW) AS sirp
       |      FROM $prev)))""".stripMargin

  /** Whole-line RMS flagger twin layers (q_r1e;
    * graft.ops.RfiFlag.rmsThresholdLines). Exact integers throughout:
    * cell amplitudes quantise to milli-units (floor(amp·1e3 + 0.5)),
    * the per-line RMS re-quantises as floor(sqrt(ssq/cnt) + 0.5) (one
    * division + correctly-rounded sqrt — deterministic IEEE in both
    * engines), and each exclusion round decides
    * 10⁴·d² > K·(m·ss − s²) with d = m·rms − s and K = ⌊k²·10⁴ + 0.5⌋
    * in HUGEINT (the Scala kernel uses BigInt; 10⁴·d² exceeds int64
    * once rms_q approaches 1e6 milli-units) — the kernel's comparison
    * verbatim, at a width that cannot overflow. `lineCol` is
    * `t` (timestep pass) or `chan` (channel pass); `flagLow` admits low
    * outliers. Layers propagate the p-layer column contract
    * (bl, t, chan, seen, res, chi1, flg) so SumThreshold/SIR layers
    * compose on either side.
    */
  private def rmsPass(prev: String, pfx: String, lineCol: String,
                      k: Double, flagLow: Boolean,
                      rounds: Int): (Seq[String], String) = {
    val bigK = math.floor(k * k * 1.0e4 + 0.5).toLong
    val base =
      s"""${pfx}base AS MATERIALIZED (
         |  SELECT l.bl, l.t, l.chan, l.seen, l.res, l.chi1, l.flg,
         |         CAST(floor(c.amp * 1000.0e0 + 0.5e0) AS BIGINT) AS au
         |  FROM $prev l JOIN cells c
         |    ON l.bl = c.bl AND l.t = c.t AND l.chan = c.chan)"""
        .stripMargin
    val q0 =
      s"""${pfx}q0 AS MATERIALIZED (
         |  SELECT bl, $lineCol,
         |         CAST(floor(sqrt(CAST(CAST(sum(au * au) AS BIGINT)
         |              AS DOUBLE) / count(*)) + 0.5e0) AS BIGINT)
         |           AS rms_q,
         |         FALSE AS lflg
         |  FROM ${pfx}base WHERE seen AND NOT flg GROUP BY 1, 2)"""
        .stripMargin
    val iters = (1 to rounds).flatMap { r =>
      val dirOk =
        if (flagLow) "TRUE" else "q.rms_q * r.m - r.s > 0"
      Seq(
        s"""${pfx}m$r AS MATERIALIZED (
           |  SELECT bl, count(*) AS m, CAST(sum(rms_q) AS BIGINT) AS s,
           |         CAST(sum(rms_q * rms_q) AS BIGINT) AS ss
           |  FROM ${pfx}q${r - 1} WHERE NOT lflg GROUP BY bl)"""
          .stripMargin,
        // the comparison runs in HUGEINT: the Scala kernel uses BigInt,
        // and with milli-unit rms_q near 1e6 and d = m*rms_q - s ~ 1e9,
        // 10^4*d^2 ~ 1e22 exceeds int64 — BIGINT would error/diverge
        // exactly where the engine succeeds
        s"""${pfx}q$r AS MATERIALIZED (
           |  SELECT q.bl, q.$lineCol, q.rms_q,
           |         (q.lflg OR (r.m >= 2 AND ($dirOk) AND
           |          10000 * CAST(q.rms_q * r.m - r.s AS HUGEINT)
           |            * CAST(q.rms_q * r.m - r.s AS HUGEINT)
           |            > $bigK * (CAST(r.m AS HUGEINT) * r.ss
           |                       - CAST(r.s AS HUGEINT) * r.s))) AS lflg
           |  FROM ${pfx}q${r - 1} q JOIN ${pfx}m$r r ON q.bl = r.bl)"""
          .stripMargin)
    }
    val out =
      s"""${pfx}out AS MATERIALIZED (
         |  SELECT b.bl, b.t, b.chan, b.seen, b.res, b.chi1,
         |         (b.flg OR coalesce(l.lflg, FALSE)) AS flg
         |  FROM ${pfx}base b LEFT JOIN ${pfx}q$rounds l
         |    ON b.bl = l.bl AND b.$lineCol = l.$lineCol)""".stripMargin
    (Seq(base, q0) ++ iters :+ out, s"${pfx}out")
  }

  /** The full RFI detection chain as composable CTE layers over any
    * source relation carrying (bl, t, chan, flag) plus the columns
    * `ampExpr` reads — returns (ctes, lastRel); lastRel has
    * (bl, t, chan, seen, flg). `srcRel` is `vis_flagged` for the
    * standalone gates and the post-passband stage relation for the
    * composed-preprocess twin.
    */
  private def r1ChainCtes(srcRel: String, ampExpr: String, madK: Double,
                          timeWeight: Double,
                          chanWeight: Double,
                          sirEtaTime: Double = 0.2,
                          sirEtaChan: Double = 0.2,
                          tsRms: Double = 0.0,
                          chRms: Double = 0.0,
                          chRmsFlagLow: Boolean = true,
                          tsRmsFinal: Double = 0.0,
                          rmsRounds: Int = 3,
                          // in-loop channel placement (q_r1f): the
                          // engine's single-iteration in-loop call
                          // site runs the channel pass per pol BEFORE
                          // SIR; the ts pass's in-loop position is
                          // already the twin's (post-detect, pre-SIR)
                          chRmsBeforeSir: Boolean = false)
      : (Seq[String], String) = {
    val chiDivT =
      (0 to 5).map(l => fmt(math.pow(1.5, l.toDouble) * timeWeight))
    val chiDivC =
      (0 to 5).map(l => fmt(math.pow(1.5, l.toDouble) * chanWeight))
    def pass(prev: String, cur: String, part: String, ord: String,
             m: Int, chiDiv: String): String = {
      val chi = s"(chi1 / $chiDiv)"
      s"""$cur AS MATERIALIZED (
         |  SELECT bl, t, chan, seen, res, chi1,
         |         (flg OR coalesce(bool_or(hit)
         |            OVER (PARTITION BY $part ORDER BY $ord
         |                  ROWS BETWEEN ${m - 1} PRECEDING AND CURRENT ROW),
         |            FALSE)) AS flg
         |  FROM (
         |    SELECT *, (idx + ${m - 1} <= n AND wsum > $chi * $m.0e0) AS hit
         |    FROM (
         |      SELECT *,
         |             sum(CASE WHEN flg THEN $chi ELSE res END)
         |               OVER (PARTITION BY $part ORDER BY $ord
         |                     ROWS BETWEEN CURRENT ROW
         |                     AND ${m - 1} FOLLOWING) AS wsum,
         |             row_number()
         |               OVER (PARTITION BY $part ORDER BY $ord) AS idx,
         |             count(*) OVER (PARTITION BY $part) AS n
         |      FROM $prev)))""".stripMargin
    }
    val prep =
      s"""cells0 AS MATERIALIZED (
        |  SELECT bl, t, chan,
        |         max($ampExpr) AS amp,
        |         bool_or(flag) AS flg
        |  FROM $srcRel GROUP BY 1, 2, 3),
        |grid AS MATERIALIZED (
        |  SELECT b.bl, b.t, c.chan
        |  FROM (SELECT DISTINCT bl, t FROM cells0) b
        |  JOIN (SELECT DISTINCT bl, chan FROM cells0) c ON b.bl = c.bl),
        |cells AS MATERIALIZED (
        |  SELECT g.bl, g.t, g.chan,
        |         coalesce(c.amp, 0.0e0) AS amp,
        |         coalesce(c.flg, FALSE) AS flg,
        |         c.bl IS NOT NULL AS seen
        |  FROM grid g LEFT JOIN cells0 c
        |    ON g.bl = c.bl AND g.t = c.t AND g.chan = c.chan),
        |bgsel AS MATERIALIZED (
        |  SELECT bl, amp, row_number() OVER (PARTITION BY bl ORDER BY amp)
        |           AS rn,
        |         count(*) OVER (PARTITION BY bl) AS n
        |  FROM cells WHERE NOT flg),
        |bg AS MATERIALIZED (SELECT bl, amp AS bg FROM bgsel WHERE rn = n // 2 + 1),
        |medsel AS MATERIALIZED (
        |  SELECT bl, amp, row_number() OVER (PARTITION BY bl ORDER BY amp)
        |           AS rn,
        |         count(*) OVER (PARTITION BY bl) AS n
        |  FROM cells WHERE seen AND NOT flg),
        |med AS MATERIALIZED (SELECT bl, amp AS med FROM medsel WHERE rn = n // 2 + 1),
        |madsel AS MATERIALIZED (
        |  SELECT c.bl, abs(c.amp - m.med) AS dev,
        |         row_number() OVER (PARTITION BY c.bl
        |                            ORDER BY abs(c.amp - m.med)) AS rn,
        |         count(*) OVER (PARTITION BY c.bl) AS n
        |  FROM cells c JOIN med m ON c.bl = m.bl
        |  WHERE c.seen AND NOT c.flg),
        |chi AS MATERIALIZED (SELECT bl, ${fmt(madK)} * 1.4826e0 * dev AS chi1
        |        FROM madsel WHERE rn = n // 2 + 1),
        |p0 AS MATERIALIZED (
        |  SELECT c.bl, c.t, c.chan, c.seen,
        |         c.amp - coalesce(b.bg, 0.0e0) AS res,
        |         coalesce(x.chi1, 1.7976931348623157e308) AS chi1,
        |         c.flg
        |  FROM cells c
        |  LEFT JOIN bg b ON c.bl = b.bl
        |  LEFT JOIN chi x ON c.bl = x.bl)""".stripMargin
    val layers = (0 to 5).flatMap { l =>
      val m = 1 << l
      Seq(
        pass(s"p${2 * l}", s"p${2 * l + 1}", "bl, chan", "t", m,
          chiDivT(l)),
        pass(s"p${2 * l + 1}", s"p${2 * l + 2}", "bl, t", "chan", m,
          chiDivC(l)))
    }
    // stage order after the SumThreshold passes, matching
    // RfiFlag.detectGroup: timestep-RMS (per pol — one pol here) →
    // SIR (time then chan) → channel-RMS; η = 0 / k = 0 emit no
    // layers (identity on both sides)
    val sirT = graft.functions.SirKernel.etaNum(sirEtaTime)
    val sirC = graft.functions.SirKernel.etaNum(sirEtaChan)
    var last = "p12"
    val postLayers = scala.collection.mutable.ArrayBuffer[String]()
    if (tsRms > 0) {
      val (ls, out) = rmsPass(last, "ts", "t", tsRms,
        flagLow = false, rmsRounds)
      postLayers ++= ls
      last = out
    }
    if (chRmsBeforeSir && chRms > 0) {
      val (ls, out) = rmsPass(last, "ch", "chan", chRms,
        chRmsFlagLow, rmsRounds)
      postLayers ++= ls
      last = out
    }
    if (sirT > 0) {
      postLayers += sirPass(last, "p13", "bl, chan", "t", sirT)
      last = "p13"
    }
    if (sirC > 0) {
      postLayers += sirPass(last, "p14", "bl, t", "chan", sirC)
      last = "p14"
    }
    if (!chRmsBeforeSir && chRms > 0) {
      val (ls, out) = rmsPass(last, "ch", "chan", chRms,
        chRmsFlagLow, rmsRounds)
      postLayers ++= ls
      last = out
    }
    // final whole-set timestep pass (ts_rms_final) after the channel
    // cleanup — high outliers only, like the per-pol pass
    if (tsRmsFinal > 0) {
      val (ls, out) = rmsPass(last, "tf", "t", tsRmsFinal,
        flagLow = false, rmsRounds)
      postLayers ++= ls
      last = out
    }
    ((prep +: (layers ++ postLayers)).toSeq, last)
  }

  private def r1SumThresholdWith(ampExpr: String, madK: Double,
                                 timeWeight: Double,
                                 chanWeight: Double,
                                 sirEtaTime: Double = 0.2,
                                 sirEtaChan: Double = 0.2,
                                 tsRms: Double = 0.0,
                                 chRms: Double = 0.0,
                                 chRmsFlagLow: Boolean = true,
                                 tsRmsFinal: Double = 0.0,
                                 rmsRounds: Int = 3,
                                 chRmsBeforeSir: Boolean = false)
      : String = {
    val (ctes, last) = r1ChainCtes("vis_flagged", ampExpr, madK,
      timeWeight, chanWeight, sirEtaTime, sirEtaChan, tsRms, chRms,
      chRmsFlagLow, tsRmsFinal, rmsRounds, chRmsBeforeSir)
    OracleSql.query(
      s"SELECT bl, t, chan, flg AS rfi FROM $last WHERE seen",
      (OracleSql.visFlaggedCte +: ctes): _*)
  }

  val r1SumThreshold: String =
    r1SumThresholdWith("sqrt(v0 * v0 + v1 * v1)", 6.0, 1.0, 1.0)

  /** R1b: a NON-default strategy (yy image, mad_k 5, time-aggressive /
    * channel-conservative direction weights, asymmetric SIR) — proves
    * the strategy knobs are load-bearing end-to-end: this gate and
    * q_r1's must both be hash-green while flagging different
    * occupancies.
    */
  val r1bStrategy: String =
    r1SumThresholdWith("sqrt(v6 * v6 + v7 * v7)", 5.0, 2.0, 0.5,
      sirEtaTime = 0.3, sirEtaChan = 0.1)

  /** R1e: the whole-line RMS flaggers (threshold_timestep_rms /
    * threshold_channel_rms / the final whole-set timestep pass — the
    * published MWA default strategy's cleanup passes) on top of the
    * default detection chain, at thresholds tight enough that all
    * three passes flag lines on the synthetic frame and the exclusion
    * iteration does real work. The channel pass exercises
    * flag_low_outliers = true.
    */
  val r1eRmsFlaggers: String =
    r1SumThresholdWith("sqrt(v0 * v0 + v1 * v1)", 6.0, 1.0, 1.0,
      tsRms = 1.02, chRms = 1.01, chRmsFlagLow = true,
      tsRmsFinal = 1.03)

  /** R1f: the RMS flaggers at their IN-LOOP call sites
    * (ts_rms_in_loop / ch_rms_in_loop — a strategy whose loop body
    * calls them). At the gate's single detect iteration the
    * observable placement difference is the channel pass running
    * per-pol BEFORE SIR instead of on the combined mask after it;
    * this gate and q_r1e must both be hash-green while flagging
    * different masks (the placement is load-bearing). Multi-iteration
    * feedback — in-loop flags entering the next iteration's
    * statistics — is pinned by RfiStrategySpec on a hand fixture.
    */
  val r1fRmsInLoop: String =
    r1SumThresholdWith("sqrt(v0 * v0 + v1 * v1)", 6.0, 1.0, 1.0,
      tsRms = 1.02, chRms = 1.01, chRmsFlagLow = true,
      chRmsBeforeSir = true)

  /** R1c sliding-median background twin: the same dense per-baseline
    * grid as the SumThreshold twin (XX amplitude, max over duplicate
    * samples, unseen cells 0/false), then the separable masked median
    * — time window ±2 per channel, then channel window ±1 per
    * timestep — through DuckDB's `median()` window aggregate (which
    * interpolates at even count and skips NULLs, exactly the kernel's
    * convention), empty windows falling back to the baseline's global
    * unflagged median. Integer micro-units.
    */
  val r1cBackground: String = OracleSql.query(
    """SELECT bl, t, chan,
      |       CAST(floor(coalesce(m2, gm, 0.0e0) * 1.0e6 + 0.5e0)
      |            AS BIGINT) AS bg_u
      |FROM (
      |  SELECT bl, t, chan,
      |         median(m1) OVER (PARTITION BY bl, t ORDER BY chan
      |                          ROWS BETWEEN 1 PRECEDING
      |                          AND 1 FOLLOWING) AS m2,
      |         median(CASE WHEN seen AND NOT flg THEN amp END)
      |           OVER (PARTITION BY bl) AS gm
      |  FROM (
      |    SELECT bl, t, chan, seen, flg, amp,
      |           median(CASE WHEN seen AND NOT flg THEN amp END)
      |             OVER (PARTITION BY bl, chan ORDER BY t
      |                   ROWS BETWEEN 2 PRECEDING
      |                   AND 2 FOLLOWING) AS m1
      |    FROM cells))""".stripMargin,
    OracleSql.visFlaggedCte,
    """cells0 AS (
      |  SELECT bl, t, chan,
      |         max(sqrt(v0 * v0 + v1 * v1)) AS amp,
      |         bool_or(flag) AS flg
      |  FROM vis_flagged GROUP BY 1, 2, 3),
      |grid AS MATERIALIZED (
      |  SELECT b.bl, b.t, c.chan
      |  FROM (SELECT DISTINCT bl, t FROM cells0) b
      |  JOIN (SELECT DISTINCT bl, chan FROM cells0) c ON b.bl = c.bl),
      |cells AS MATERIALIZED (
      |  SELECT g.bl, g.t, g.chan,
      |         coalesce(c.amp, 0.0e0) AS amp,
      |         coalesce(c.flg, FALSE) AS flg,
      |         c.bl IS NOT NULL AS seen
      |  FROM grid g LEFT JOIN cells0 c
      |    ON g.bl = c.bl AND g.t = c.t AND g.chan = c.chan)""".stripMargin)

  /** R1d Gaussian high-pass background twin — AOFlagger's actual
    * high_pass_filter kernel (masked normalized Gaussian convolution).
    * The kernel quantises amplitudes to integer micro-units and runs
    * the separable convolution in exact int64 with INTEGER taps
    * ([[graft.functions.BackgroundKernel.gaussWeights]]); this twin
    * carries the SAME taps as literals and decomposes each pass into
    * lag/lead terms — order-free BIGINT sums, one double division at
    * the end — so the compare is bit-exact. Windows with zero mask
    * weight fall back to the baseline's global unflagged mean.
    */
  val r1dGaussianBg: String = {
    val wT = graft.functions.BackgroundKernel.gaussWeights(2, 1.5)
    val wC = graft.functions.BackgroundKernel.gaussWeights(1, 1.0)
    // Σ_k w(k)·x(i+k) as explicit lag/lead terms (defaults cover the
    // truncated borders)
    def taps(w: Array[Long], expr: String, part: String,
             ord: String): String =
      w.zipWithIndex.map { case (wk, idx) =>
        val k = idx - w.length / 2
        if (k == 0) s"$wk * $expr"
        else {
          val sh =
            if (k < 0) s"lag($expr, ${-k}, CAST(0 AS BIGINT))"
            else s"lead($expr, $k, CAST(0 AS BIGINT))"
          s"$wk * ($sh OVER (PARTITION BY $part ORDER BY $ord))"
        }
      }.mkString("\n           + ")
    OracleSql.query(
      s"""SELECT bl, t, chan,
         |       CASE
         |         WHEN den2 > 0 THEN
         |           CAST(floor(CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)
         |                      + 0.5e0) AS BIGINT)
         |         WHEN gden > 0 THEN
         |           CAST(floor(CAST(gnum AS DOUBLE) / CAST(gden AS DOUBLE)
         |                      + 0.5e0) AS BIGINT)
         |         ELSE CAST(0 AS BIGINT)
         |       END AS bg_u
         |FROM (
         |  SELECT bl, t, chan, gnum, gden,
         |         ${taps(wC, "num1", "bl, t", "chan")} AS num2,
         |         ${taps(wC, "den1", "bl, t", "chan")} AS den2
         |  FROM (
         |    SELECT bl, t, chan,
         |           ${taps(wT, "am", "bl, chan", "t")} AS num1,
         |           ${taps(wT, "m", "bl, chan", "t")} AS den1,
         |           CAST(sum(am) OVER (PARTITION BY bl) AS BIGINT)
         |             AS gnum,
         |           CAST(sum(m) OVER (PARTITION BY bl) AS BIGINT)
         |             AS gden
         |    FROM cells))""".stripMargin,
      OracleSql.visFlaggedCte,
      """cells0 AS (
        |  SELECT bl, t, chan,
        |         max(CAST(floor(sqrt(v0 * v0 + v1 * v1) * 1.0e6
        |                        + 0.5e0) AS BIGINT)) AS amp_u,
        |         bool_or(flag) AS flg
        |  FROM vis_flagged GROUP BY 1, 2, 3),
        |grid AS MATERIALIZED (
        |  SELECT b.bl, b.t, c.chan
        |  FROM (SELECT DISTINCT bl, t FROM cells0) b
        |  JOIN (SELECT DISTINCT bl, chan FROM cells0) c ON b.bl = c.bl),
        |cells AS MATERIALIZED (
        |  SELECT g.bl, g.t, g.chan,
        |         CASE WHEN c.bl IS NOT NULL AND NOT c.flg
        |              THEN coalesce(c.amp_u, CAST(0 AS BIGINT))
        |              ELSE CAST(0 AS BIGINT) END AS am,
        |         CASE WHEN c.bl IS NOT NULL AND NOT c.flg
        |              THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS m
        |  FROM grid g LEFT JOIN cells0 c
        |    ON g.bl = c.bl AND g.t = c.t AND g.chan = c.chan)""".stripMargin)
  }

  val r1ThresholdFlags: String = OracleSql.query(
    """SELECT t, bl, chan, amp > lim AS rfi
      |FROM (
      |  SELECT t, bl, chan, amp,
      |         avg(amp) OVER (PARTITION BY bl)
      |           + 3.0e0 * stddev_samp(amp) OVER (PARTITION BY bl) AS lim
      |  FROM (SELECT t, bl, chan, sqrt(v0 * v0 + v1 * v1) AS amp
      |        FROM vis))""".stripMargin)

  // ---- sinks ---------------------------------------------------------

  val k1UvfitsOrder: String = OracleSql.queryWeighted(
    s"""SELECT *,
       |       row_number() OVER (ORDER BY t_out, bl, c_out) - 1 AS row_idx
       |FROM avg""".stripMargin,
    s"avg AS (\n$avgBody)")

  /** q_k1e_mirror_uvfits_order: the PRODUCTION sink path end-to-end —
    * the canonical (t, chan) mirror feeding the full correction chain,
    * the real averaging operator, and the uvfits writer's global
    * time-major-baseline row order. The oracle is the q_pp3 composed
    * chain (layout-invariant — the mirror holds the same rows) with
    * the sink's total order assigned by one window; (t_out, bl, c_out)
    * is unique per averaged row, so the order — and hence row_idx —
    * is deterministic in both engines.
    */
  val k1eMirrorUvfitsOrder: String =
    s"""SELECT *,
       |       row_number() OVER (ORDER BY t_out, bl, c_out) - 1
       |         AS row_idx
       |FROM ($ppPreprocessAvg) avg""".stripMargin

  /** K1b uvfits UVW group parameters: one row per written group with
    * UU VV WW = (part(ant1) − part(ant2)) / c in seconds, cast through
    * float32 exactly as the binary writer emits them (reference group
    * params /root/reference/src/io/mod.rs:392-467). The Spark side
    * reads the parameters BACK out of the written file, so the gate
    * covers the whole encode → binary layout → decode loop.
    */
  val k1bUvw: String = {
    val uvwSec = Seq("u", "v", "w").map { ax =>
      s"       CAST(CAST((u1.${ax}_m - u2.${ax}_m) / 299792458.0e0" +
        s" AS REAL) AS DOUBLE) AS ${ax}_s"
    }.mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT g.t_out, g.ant1, g.ant2,
         |$uvwSec
         |-- centroid convention: UVW at input step t_out*2 + 1, the
         |-- instant the DATE group params are stamped at
         |FROM (SELECT DISTINCT t_out, ant1, ant2 FROM avg) g
         |JOIN uvw u1 ON u1.t = g.t_out * 2 + 1 AND u1.ant = g.ant1
         |JOIN uvw u2 ON u2.t = g.t_out * 2 + 1 AND u2.ant = g.ant2"""
        .stripMargin,
      s"avg AS (\n$avgBody)", uvwCte)
  }

  /** K1c: the AIPS AN antenna table read back from the written uvfits
    * file — TileNNN names, 1-based NOSTA (the BASELINE id convention),
    * alt-az MNTSTA, X/Y linear feeds, and the ENH→local-XYZ station
    * positions at the geometry stage's latitude in micro-metre
    * integers. The latitude trig enters as Scala-formatted literals,
    * so both engines run the identical IEEE expression over the dyadic
    * ENH coordinates — the micro-unit floor is then exact on both
    * sides.
    */
  val k1cAntennaTable: String = {
    import GeometryCorrection._
    val sl = fmt(math.sin(LatRad)); val cl = fmt(math.cos(LatRad))
    OracleSql.query(
      s"""SELECT 'Tile' || lpad(CAST(ant AS VARCHAR), 3, '0') AS anname,
         |       CAST(ant + 1 AS BIGINT) AS nosta,
         |       CAST(0 AS BIGINT) AS mntsta,
         |       CAST(floor(((- north_m) * $sl + height_m * $cl)
         |            * 1.0e6 + 0.5e0) AS BIGINT) AS stabx_u,
         |       CAST(floor(east_m * 1.0e6 + 0.5e0) AS BIGINT)
         |         AS staby_u,
         |       CAST(floor((north_m * $cl + height_m * $sl)
         |            * 1.0e6 + 0.5e0) AS BIGINT) AS stabz_u,
         |       'X' AS poltya, 'Y' AS poltyb,
         |       CAST(90 AS BIGINT) AS polab
         |FROM antenna""".stripMargin)
  }

  /** K2 MS MAIN-table oracle: the row skeleton of `MsWriter.msMain` —
    * MS row order (time-major then baseline), MJD-second timestamps,
    * baseline UVW from the shared uvw CTE, and the channel-axis
    * aggregates (n_chan, FLAG_ROW, exact dyadic weight sums).
    */
  private val k2Inner: String = {
    val timeConst = fmt(graft.sinks.MsWriter.MjdEpochOffsetS
      + graft.model.Obs.GpsStart.toDouble + 2.0)
    s"""SELECT m.t_out, m.bl, m.ant1, m.ant2,
       |       $timeConst + CAST(m.t_out AS DOUBLE) * 4.0e0 AS time_s,
       |       4.0e0 AS interval_s, 4.0e0 AS exposure_s,
       |       round(u1.u_m - u2.u_m, 6) AS u_m,
       |       round(u1.v_m - u2.v_m, 6) AS v_m,
       |       round(u1.w_m - u2.w_m, 6) AS w_m,
       |       m.n_chan, m.flag_row, m.weight_sum,
       |       CAST(0 AS BIGINT) AS data_desc_id,
       |       CAST(0 AS BIGINT) AS field_id,
       |       CAST(1 AS BIGINT) AS scan_number
       |FROM (SELECT t_out, bl, ant1, ant2, count(*) AS n_chan,
       |             bool_and(flag_out) AS flag_row,
       |             sum(weight_out) AS weight_sum
       |      FROM avg GROUP BY 1, 2, 3, 4) m
       |-- centroid convention: UVW at input step t_out*2 + 1, the
       |-- same instant the TIME column is stamped at
       |JOIN uvw u1 ON u1.t = m.t_out * 2 + 1 AND u1.ant = m.ant1
       |JOIN uvw u2 ON u2.t = m.t_out * 2 + 1 AND u2.ant = m.ant2"""
      .stripMargin
  }

  val k2MsOrder: String = OracleSql.queryWeighted(
    s"""SELECT *, row_number() OVER (ORDER BY t_out, bl) - 1 AS row_idx
       |FROM (
       |$k2Inner)""".stripMargin,
    s"avg AS (\n$avgBody)", uvwCte)

  /** K2b: the BINARY MS container's MAIN scalars, read back out of the
    * written table.f0 — the same skeleton as q_k2's oracle restricted
    * to the columns the container stores, in its physical row order.
    * Covers the fixed-width encode → descriptor → decode loop the
    * parquet-mirror gate cannot see.
    */
  val k2bMsContainer: String = OracleSql.queryWeighted(
    s"""SELECT row_number() OVER (ORDER BY t_out, bl) - 1 AS row_idx,
       |       time_s, ant1, ant2, u_m, v_m, w_m, interval_s,
       |       exposure_s, flag_row, data_desc_id, field_id, scan_number
       |FROM (
       |$k2Inner)""".stripMargin,
    s"avg AS (\n$avgBody)", uvwCte)

  /** K1d uvfits payload twin: the averaged frame's components and
    * weight through the file's float32 quantisation, densified over
    * the channel axis (the writer zero-fills absent channels inside
    * every group it emits).
    */
  val k1dUvfitsData: String = {
    val comps = (0 until 8).map(k =>
      s"  CAST(CAST(coalesce(a$k, 0.0e0) AS FLOAT) AS DOUBLE) AS a$k")
      .mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT g.t_out, g.bl, g.chan AS c_out,
         |$comps,
         |  CAST(CAST(coalesce(weight_out, 0.0e0) AS FLOAT) AS DOUBLE)
         |    AS weight_out
         |FROM (
         |  SELECT r.t_out, r.bl, c.c AS chan
         |  FROM (SELECT DISTINCT t_out, bl FROM avg) r
         |  CROSS JOIN (SELECT CAST(unnest(range(0, 16)) AS BIGINT)
         |                AS c) c) g
         |LEFT JOIN avg v
         |  ON v.t_out = g.t_out AND v.bl = g.bl AND v.c_out = g.chan"""
        .stripMargin,
      s"avg AS (\n$avgBody)")
  }

  /** K2f MAIN payload twin: the averaged science data reshaped to the
    * container's pol-fastest cell layout, with the writer's
    * double→float32 quantisation replicated as CAST(... AS FLOAT)
    * before widening back — bit-identical to the JVM's .toFloat.
    * WEIGHT_SPECTRUM carries the channel's weight_out for all four
    * pols; FLAG is the averaged flag_out.
    */
  val k2fMsData: String = OracleSql.queryWeighted(
    s"""SELECT g.row_idx, g.chan, g.pol,
       |  CAST(CAST(coalesce(CASE g.pol WHEN 0 THEN a0 WHEN 1 THEN a2
       |            WHEN 2 THEN a4 ELSE a6 END, 0.0e0) AS FLOAT)
       |       AS DOUBLE) AS re,
       |  CAST(CAST(coalesce(CASE g.pol WHEN 0 THEN a1 WHEN 1 THEN a3
       |            WHEN 2 THEN a5 ELSE a7 END, 0.0e0) AS FLOAT)
       |       AS DOUBLE) AS im,
       |  CAST(CAST(coalesce(weight_out, 0.0e0) AS FLOAT) AS DOUBLE)
       |    AS wspec,
       |  coalesce(flag_out, false) AS flag
       |FROM (
       |  -- dense pol-fastest cell grid: the container zero-fills
       |  -- channels absent from the (sparse) averaged frame
       |  SELECT r.t_out, r.bl, r.row_idx,
       |         c.c AS chan, CAST(p.p AS BIGINT) AS pol
       |  FROM (SELECT t_out, bl, row_number()
       |          OVER (ORDER BY t_out, bl) - 1 AS row_idx
       |        FROM (SELECT DISTINCT t_out, bl FROM avg)) r
       |  CROSS JOIN (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS c) c
       |  CROSS JOIN (SELECT unnest(range(0, 4)) AS p) p) g
       |LEFT JOIN avg v
       |  ON v.t_out = g.t_out AND v.bl = g.bl AND v.c_out = g.chan"""
      .stripMargin,
    s"avg AS (\n$avgBody)")

  /** K2c casacore structural audit twin: the Spark side walks every
    * AipsIO object header of the written container; this recomputes
    * the expected structure counts from first principles — object
    * counts are a pure function of the column sets (per table:
    * 7 framework objects + 3 per scalar column + 4 per array column
    * in table.dat; 1 + ncols in table.f0), MAIN row count is the
    * distinct (t_out, bl) grid, ANTENNA row count the antenna dim.
    */
  val k2cMsCasacore: String = OracleSql.queryWeighted(
    s"""SELECT tab, n_rows, n_cols, dat_objs, f0_objs FROM (VALUES
       |  ('MAIN',
       |   (SELECT count(*) FROM (SELECT DISTINCT t_out, bl FROM avg)),
       |   CAST(22 AS BIGINT), CAST(79 AS BIGINT), CAST(23 AS BIGINT)),
       |  ('ANTENNA', (SELECT count(*) FROM antenna),
       |   CAST(5 AS BIGINT), CAST(23 AS BIGINT), CAST(6 AS BIGINT)),
       |  ('DATA_DESCRIPTION', CAST(1 AS BIGINT),
       |   CAST(3 AS BIGINT), CAST(16 AS BIGINT), CAST(4 AS BIGINT)),
       |  ('FEED', (SELECT count(*) FROM antenna),
       |   CAST(9 AS BIGINT), CAST(36 AS BIGINT), CAST(10 AS BIGINT)),
       |  ('FIELD', CAST(1 AS BIGINT),
       |   CAST(2 AS BIGINT), CAST(14 AS BIGINT), CAST(3 AS BIGINT)),
       |  ('FLAG_CMD', CAST(0 AS BIGINT),
       |   CAST(8 AS BIGINT), CAST(31 AS BIGINT), CAST(9 AS BIGINT)),
       |  ('HISTORY', CAST(0 AS BIGINT),
       |   CAST(6 AS BIGINT), CAST(25 AS BIGINT), CAST(7 AS BIGINT)),
       |  ('OBSERVATION', CAST(1 AS BIGINT),
       |   CAST(3 AS BIGINT), CAST(17 AS BIGINT), CAST(4 AS BIGINT)),
       |  ('POINTING', CAST(0 AS BIGINT),
       |   CAST(9 AS BIGINT), CAST(36 AS BIGINT), CAST(10 AS BIGINT)),
       |  ('POLARIZATION', CAST(1 AS BIGINT),
       |   CAST(2 AS BIGINT), CAST(14 AS BIGINT), CAST(3 AS BIGINT)),
       |  ('PROCESSOR', CAST(0 AS BIGINT),
       |   CAST(5 AS BIGINT), CAST(22 AS BIGINT), CAST(6 AS BIGINT)),
       |  ('SPECTRAL_WINDOW', CAST(1 AS BIGINT),
       |   CAST(5 AS BIGINT), CAST(24 AS BIGINT), CAST(6 AS BIGINT)),
       |  ('STATE', CAST(0 AS BIGINT),
       |   CAST(7 AS BIGINT), CAST(28 AS BIGINT), CAST(8 AS BIGINT))
       |) AS t(tab, n_rows, n_cols, dat_objs, f0_objs)""".stripMargin,
    s"avg AS (\n$avgBody)")

  /** K2d ANTENNA subtable value twin: the Spark side decodes names,
    * positions and dish diameters back out of the casacore bytes; this
    * recomputes them from the antenna dimension (TileNNN naming, MWA
    * station/mount constants, exact ENH double round-trip).
    */
  val k2dMsAntenna: String = OracleSql.query(
    """SELECT ant, 'Tile' || lpad(CAST(ant AS VARCHAR), 3, '0') AS name,
      |       'MWA' AS station, 'ALT-AZ' AS mount,
      |       east_m, north_m, height_m, 4.0e0 AS dish_m
      |FROM antenna""".stripMargin)

  /** K2g reader-replay twin: the Spark side re-opens every table of
    * the written container along casacore's own open path
    * (table.dat → Table → TableDesc → per-column descriptors →
    * ColumnSet, then the per-column StManAipsIO extension chains in
    * table.f0), consuming every object EXACTLY to its framed length,
    * and emits each column descriptor it decoded in sequence. This
    * side pins the expected descriptor sequences — the MeasurementSet
    * v2 required column sets (MS v2 definition; casacore
    * ms/MeasurementSets/MSTable columns), with the casacore DataType
    * codes (Bool=0, Int=5, Float=7, Double=8, Complex=9, String=11)
    * and the fixture's 4×16 DATA shape. A descriptor field out of
    * order fails Spark-side (boundary require); a wrong column,
    * type, position or shape fails the hash here.
    */
  private val k2gSpec: Seq[(String, Seq[(String, Int, String)])] = {
    val B = 0; val I = 5; val F = 7; val D = 8; val C = 9; val S = 11
    Seq(
      "MAIN" -> Seq(
        ("TIME", D, ""), ("ANTENNA1", I, ""), ("ANTENNA2", I, ""),
        ("UVW", D, "3"), ("INTERVAL", D, ""), ("EXPOSURE", D, ""),
        ("FLAG_ROW", B, ""), ("DATA_DESC_ID", I, ""),
        ("FIELD_ID", I, ""), ("SCAN_NUMBER", I, ""),
        ("DATA", C, "4x16"), ("WEIGHT_SPECTRUM", F, "4x16"),
        ("FLAG", B, "4x16"), ("FEED1", I, ""), ("FEED2", I, ""),
        ("ARRAY_ID", I, ""), ("OBSERVATION_ID", I, ""),
        ("PROCESSOR_ID", I, ""), ("STATE_ID", I, ""),
        ("TIME_CENTROID", D, ""), ("WEIGHT", F, "4"),
        ("SIGMA", F, "4")),
      "ANTENNA" -> Seq(
        ("NAME", S, ""), ("STATION", S, ""), ("MOUNT", S, ""),
        ("POSITION", D, "3"), ("DISH_DIAMETER", D, "")),
      "DATA_DESCRIPTION" -> Seq(
        ("SPECTRAL_WINDOW_ID", I, ""), ("POLARIZATION_ID", I, ""),
        ("FLAG_ROW", B, "")),
      "FEED" -> Seq(
        ("ANTENNA_ID", I, ""), ("FEED_ID", I, ""),
        ("SPECTRAL_WINDOW_ID", I, ""), ("TIME", D, ""),
        ("INTERVAL", D, ""), ("NUM_RECEPTORS", I, ""),
        ("BEAM_ID", I, ""), ("POLARIZATION_TYPE", S, "2"),
        ("RECEPTOR_ANGLE", D, "2")),
      "FIELD" -> Seq(("NAME", S, ""), ("PHASE_DIR", D, "2")),
      "FLAG_CMD" -> Seq(
        ("TIME", D, ""), ("INTERVAL", D, ""), ("TYPE", S, ""),
        ("REASON", S, ""), ("LEVEL", I, ""), ("SEVERITY", I, ""),
        ("APPLIED", B, ""), ("COMMAND", S, "")),
      "HISTORY" -> Seq(
        ("TIME", D, ""), ("OBSERVATION_ID", I, ""), ("MESSAGE", S, ""),
        ("PRIORITY", S, ""), ("ORIGIN", S, ""), ("APPLICATION", S, "")),
      "OBSERVATION" -> Seq(
        ("TELESCOPE_NAME", S, ""), ("OBSERVER", S, ""),
        ("TIME_RANGE", D, "2")),
      "POINTING" -> Seq(
        ("ANTENNA_ID", I, ""), ("TIME", D, ""), ("INTERVAL", D, ""),
        ("NAME", S, ""), ("NUM_POLY", I, ""), ("TIME_ORIGIN", D, ""),
        ("DIRECTION", D, "2"), ("TARGET", D, "2"), ("TRACKING", B, "")),
      "POLARIZATION" -> Seq(
        ("NUM_CORR", I, ""), ("CORR_TYPE", I, "4")),
      "PROCESSOR" -> Seq(
        ("TYPE", S, ""), ("SUB_TYPE", S, ""), ("TYPE_ID", I, ""),
        ("MODE_ID", I, ""), ("FLAG_ROW", B, "")),
      "SPECTRAL_WINDOW" -> Seq(
        ("NUM_CHAN", I, ""), ("CHAN_FREQ", D, "16"),
        ("CHAN_WIDTH", D, "16"), ("TOTAL_BANDWIDTH", D, ""),
        ("REF_FREQUENCY", D, "")),
      "STATE" -> Seq(
        ("SIG", B, ""), ("REF", B, ""), ("CAL", D, ""),
        ("LOAD", D, ""), ("SUB_SCAN", I, ""), ("OBS_MODE", S, ""),
        ("FLAG_ROW", B, "")))
  }

  val k2gMsReplay: String = {
    val rows = k2gSpec.flatMap { case (tab, cols) =>
      cols.zipWithIndex.map { case ((name, tp, shape), i) =>
        s"('$tab', CAST($i AS BIGINT), '$name', " +
          s"CAST($tp AS BIGINT), '$shape')"
      }
    }.mkString(",\n  ")
    s"""SELECT tab, idx, col, tp, shape_s FROM (VALUES
       |  $rows
       |) AS t(tab, idx, col, tp, shape_s)""".stripMargin
  }

  /** K2e SPECTRAL_WINDOW decode twin: the frequency axis the writer
    * derives from the metadata seam (base 150 MHz, 40 kHz fine
    * channels, ×2 frequency averaging → 16 channels of 80 kHz,
    * centre-of-pair CHAN_FREQ), recomputed with the same double
    * arithmetic.
    */
  val k2eMsSpw: String = OracleSql.query(
    """SELECT CAST(i AS BIGINT) AS chan,
      |       150000000.0e0 + (CAST(i AS DOUBLE) * 2.0e0 + 0.5e0)
      |         * 40000.0e0 AS freq_hz,
      |       80000.0e0 AS width_hz,
      |       CAST(16 AS BIGINT) AS num_chan,
      |       150020000.0e0 AS ref_freq_hz,
      |       1280000.0e0 AS total_bw_hz
      |FROM range(0, 16) r(i)""".stripMargin)

  /** The 128-fine-chan widening the mwaf gates apply (legacy 10 kHz
    * width): fc128 = fc + 8·((5t + 3bl + chan) mod 16) — pure
    * positive-BIGINT arithmetic, identical in both engines.
    */
  private val visWide128Cte: String = """
vis_wide AS (
  SELECT cc, bl, t,
         CAST(fc + 8 * ((t * 5 + bl * 3 + chan) % 16) AS BIGINT) AS fcw,
         flag
  FROM vis_flagged)"""

  /** The per-32-chan-word mask table over vis_wide: every (cc, bl, t)
    * group emits ALL four words (bit_or of CASE..ELSE 0), exactly the
    * fixed-length array the Spark side posexplodes. 32-bit words
    * because DuckDB refuses `1::BIGINT << 63` (measured overflow
    * error) — a 64-bit payload cannot be oracle-computed; see
    * graft.sinks.Sinks.MwafWordChans.
    */
  private val wideWordMasks: String =
    """SELECT cc, bl, t, w.word,
      |       CAST(bit_or(CASE WHEN flag AND fcw // 32 = w.word
      |                   THEN (CAST(1 AS BIGINT) << CAST(fcw % 32 AS INT))
      |                   ELSE 0 END) AS BIGINT) AS flag_mask,
      |       count(*) AS n_samples
      |FROM vis_wide
      |CROSS JOIN (SELECT CAST(i AS BIGINT) AS word
      |            FROM range(0, 4) r(i)) w
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** S4 mwaf container round trip AT THE LEGACY 128-CHAN WIDTH: the
    * Spark side WRITES the per-cc mwaf FITS files (16-byte X columns)
    * and reads them back; this twin recomputes the dense grid the
    * files must hold — every (cc ∈ data, t, bl) cell × 4 words,
    * present cells carrying the per-word flag bitvector, absent cells
    * fully flagged at the 32-bit word width 4294967295
    * (missing-HDU semantics, /root/reference/src/io/mod.rs:297-303;
    * arbitrary-width dense table /root/reference/src/io/mwaf.rs:424-495).
    */
  val s4MwafRoundtrip: String = OracleSql.query(
    s"""SELECT g.cc, g.t, g.bl, g.word,
       |       coalesce(m.flag_mask, CAST(4294967295 AS BIGINT))
       |         AS flag_mask
       |FROM (SELECT c.cc, ts.t, b.bl, w.word
       |      FROM (SELECT DISTINCT cc FROM vis) c
       |      CROSS JOIN timestep ts CROSS JOIN baseline b
       |      CROSS JOIN (SELECT CAST(i AS BIGINT) AS word
       |                  FROM range(0, 4) r(i)) w) g
       |LEFT JOIN ($wideWordMasks) m
       |  ON g.cc = m.cc AND g.t = m.t AND g.bl = m.bl
       |     AND g.word = m.word""".stripMargin,
    OracleSql.visFlaggedCte, visWide128Cte)

  val k3MwafBitmask: String = OracleSql.query(
    wideWordMasks,
    OracleSql.visFlaggedCte, visWide128Cte)

  val k3MwafOccupancy: String = OracleSql.query(
    """SELECT cc, bl, count(*) AS n_cells,
      |       CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_flagged,
      |       CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS occupancy
      |FROM vis_flagged GROUP BY 1, 2""".stripMargin,
    OracleSql.visFlaggedCte)
}
