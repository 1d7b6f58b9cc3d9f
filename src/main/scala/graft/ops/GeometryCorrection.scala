package graft.ops

import graft.model.Obs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C2 `correct_geometry` (/root/reference/src/corrections.rs:207-293).
  *
  * The reference computes, per timestep, per-antenna partial UVWs from
  * precessed tile positions (`calc_part_uvws`, corrections.rs:652-676),
  * then per baseline w = part_uvw[ant1].w - part_uvw[ant2].w
  * (corrections.rs:277) and per channel vis *= exp(-j 2π w f / c)
  * (corrections.rs:279-284).
  *
  * We keep that exact two-phase shape:
  *  1. [[partUvw]] — a tiny (timestep x antenna) dimension computed with
  *     the standard ENH→XYZ→UVW rotation at hour angle HA(t) and
  *     declination δ of the phase centre. (The reference additionally
  *     precesses positions to J2000 via ERFA; our phase model uses fixed
  *     mean coordinates — the precession kernel is a driver-side table
  *     producer by design, so an ephemeris-accurate variant can replace
  *     [[partUvw]] without touching the correction operator.)
  *  2. [[apply]] — broadcast-join the uvw dim on both antenna sides and
  *     rotate all four pols by the same per-(t, bl, chan) phase.
  *
  * At 100 TB the uvw table stays O(timesteps x antennas) — thousands of
  * rows — while the fact table never shuffles.
  */
object GeometryCorrection {

  import Obs._

  /** Array latitude (radians) — dyadic so both engines see exact inputs. */
  val LatRad: Double = -15.0 / 32.0 // ~ -26.87°, MWA-like
  /** Phase-centre declination (radians), dyadic. */
  val DecRad: Double = 0.25
  /** Hour angle at timestep 0 (radians), dyadic. */
  val Ha0: Double = 0.5
  /** Hour-angle increment per timestep (radians), dyadic. */
  val DHa: Double = 1.0 / 1024.0

  // Fixed site + phase centre for the apparent-place UVW gate
  // (q_c2b_geometry_app): MWA-like longitude/latitude, arbitrary
  // J2000.0 centre, a nonzero dut1 so the UT1 path is exercised.
  val AppLonRad: Double = 2.0362898
  val AppLatRad: Double = -0.46606085
  val AppRaJ2000: Double = 1.0
  val AppDecJ2000: Double = -0.5
  val AppDut1Sec: Double = 0.05

  // Cotter's MWA array position (the published constants Cotter bakes
  // in, surfaced by the reference as COTTER_MWA_* and selected by
  // --emulate-cotter, /root/reference/src/cli.rs:1353-1360). A few
  // hundredths of an arcsecond off the default site — enough to move
  // long-baseline w at the millimetre level, which Cotter-comparison
  // workflows must reproduce exactly.
  val CotterLonRad: Double = 2.0362897754687257
  val CotterLatRad: Double = -0.46606083776035967
  val CotterHeightM: Double = 377.0

  /** Per-(t, ant) partial UVW dimension (reference calc_part_uvws).
    * XYZ from ENH: X = -N sinφ + H cosφ, Y = E, Z = N cosφ + H sinφ;
    * then u = sinH·X + cosH·Y
    *      v = -sinδ cosH·X + sinδ sinH·Y + cosδ·Z
    *      w =  cosδ cosH·X - cosδ sinH·Y + sinδ·Z.
    */
  def partUvw(timestep: DataFrame, antenna: DataFrame): DataFrame = {
    val t = timestep.select("t")
    val a = antenna.select("ant", "east_m", "north_m", "height_m")
    val ha = lit(Ha0) + col("t") * DHa
    val xyz = t.crossJoin(a).withColumns(Map(
      "xc" -> (-col("north_m") * math.sin(LatRad)
        + col("height_m") * math.cos(LatRad)),
      "yc" -> col("east_m"),
      "zc" -> (col("north_m") * math.cos(LatRad)
        + col("height_m") * math.sin(LatRad)),
      "sh" -> sin(ha), "ch" -> cos(ha)))
    xyz.select(col("t"), col("ant"),
      (col("sh") * col("xc") + col("ch") * col("yc")).as("u_m"),
      (lit(-math.sin(DecRad)) * col("ch") * col("xc")
        + lit(math.sin(DecRad)) * col("sh") * col("yc")
        + lit(math.cos(DecRad)) * col("zc")).as("v_m"),
      (lit(math.cos(DecRad)) * col("ch") * col("xc")
        - lit(math.cos(DecRad)) * col("sh") * col("yc")
        + lit(math.sin(DecRad)) * col("zc")).as("w_m"))
  }

  /** Ephemeris-accurate UVW table: apparent = frame bias + IAU-2006
    * precession + IAU-2000B nutation + aberration
    * ([[graft.functions.Iau2006]]); mean = GMST + IAU-1976 precession via
    * [[graft.functions.Astro]], evaluated per (timestep, antenna) on the
    * driver (metadata-sized), returned as the same broadcastable shape
    * as [[partUvw]]. This is the production table producer; the dyadic
    * [[partUvw]] is the oracle-checkable one.
    */
  def partUvwAstro(spark: SparkSession, timestep: DataFrame,
                   antenna: DataFrame, lonRad: Double, latRad: Double,
                   raJ2000: Double, decJ2000: Double,
                   dut1Sec: Double = 0.0,
                   apparent: Boolean = false): DataFrame = {
    import graft.functions.Astro
    import spark.implicits._
    val ts = timestep.select("t", "gps_s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ants = antenna.select("ant", "east_m", "north_m", "height_m")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    // apparent chain: IAU-2006/2000B (the reference's ERFA-class
    // model); mean chain: classical IAU-1976 equinox precession
    val at =
      if (apparent) graft.functions.Iau2006.partUvwApparent06At _
      else Astro.partUvwAt _
    val rows = for {
      (t, gps) <- ts.toSeq
      (ant, e, n, h) <- ants.toSeq
    } yield {
      val (u, v, w) = at(gps.toDouble + Obs.IntTimeS / 2,
        lonRad, latRad, raJ2000, decJ2000, dut1Sec, e, n, h)
      (t, ant, u, v, w)
    }
    rows.toDF("t", "ant", "u_m", "v_m", "w_m")
  }

  private def theta(w: Column): Column =
    lit(-2.0) * math.Pi * w * col("freq_hz") / SpeedOfLight

  /** Rotate all pols by exp(-j 2π (w1-w2) f / c). */
  def apply(vis: DataFrame, uvw: DataFrame): DataFrame = {
    graft.model.SchemaCheck.requireVis(vis, "GeometryCorrection")
    val u1 = broadcast(uvw.select(col("t"), col("ant").as("ant1"),
      col("w_m").as("w1")))
    val u2 = broadcast(uvw.select(col("t"), col("ant").as("ant2"),
      col("w_m").as("w2")))
    val joined = vis.join(u1, Seq("t", "ant1")).join(u2, Seq("t", "ant2"))
    val th = theta(col("w1") - col("w2"))
    val cs = cos(th)
    val sn = sin(th)
    // one withColumns per stage (not per-column folds): chained
    // withColumn re-analyzes the whole plan per step — quadratic
    // driver time over the composed preprocess chain
    val rotated = joined
      .withColumns(Map("cs" -> cs, "sn" -> sn))
      .withColumns((0 until 4).flatMap { p =>
        val (ri, ii) = (2 * p, 2 * p + 1)
        Seq(
          s"n$ri" -> (col(s"v$ri") * col("cs")
            - col(s"v$ii") * col("sn")),
          s"n$ii" -> (col(s"v$ri") * col("sn")
            + col(s"v$ii") * col("cs")))
      }.toMap)
    val replaced = rotated.withColumns(
      (0 until 8).map(k => s"v$k" -> col(s"n$k")).toMap)
      .drop((0 until 8).map(k => s"n$k"): _*)
    replaced.drop("w1", "w2", "cs", "sn")
  }
}
