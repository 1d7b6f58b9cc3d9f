package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Where observation metadata comes from — the seam between the
  * synthetic oracle-gated observation ([[SynthDims]]) and a REAL
  * metafits container ([[graft.sources.MetafitsMeta]]). The reference
  * has the same seam: every correction takes a `MetafitsContext`
  * (/root/reference/src/corrections.rs:118-127, :356-365) and doesn't
  * care whether mwalib filled it from disk or a test fixture.
  *
  * All tables are broadcast-sized; implementations return plan-time
  * local relations that Catalyst folds into broadcast joins.
  */
trait MetaSource {
  def antenna(s: SparkSession): DataFrame

  /** The antenna dim when this source actually provides one.
    * Provenance-only consumers (the mwaf TILES extension) consult this
    * and fall back to the MWA `TileNNN` naming convention derived from
    * `nAnts` alone when it is `None` — mwaf writing itself needs only
    * the timestep/baseline dims (the contract `MwafForeignSpec` pins;
    * the reference's finalise likewise writes provenance from context
    * it already holds, /root/reference/src/io/mwaf.rs:504-625, never
    * demanding extra inputs at finalise time).
    */
  def antennaOpt(s: SparkSession): Option[DataFrame] = Some(antenna(s))
  def timestep(s: SparkSession): DataFrame
  def chan(s: SparkSession): DataFrame
  def baseline(s: SparkSession): DataFrame
  def digitalGain(s: SparkSession): DataFrame

  /** Antennas whose metafits flag bit is set (Van Vleck skips them). */
  def flaggedAnts(s: SparkSession): Seq[Long]

  /** Whether the container says cable delays are ALREADY applied — the
    * CLI auto-skips the cable stage then
    * (/root/reference/src/cli.rs:1389-1399).
    */
  def cableApplied: Boolean = false

  /** Same decision for geometric delays (cli.rs:1444-1452). */
  def geometryApplied: Boolean = false

  /** Input integration time, seconds (metafits INTTIME). */
  def intTimeS: Double = Obs.IntTimeS

  /** Cotter-legacy weight factor from the container constants:
    * (fine_chan_width / 10 kHz) · (int_time / 1 s)
    * (reference get_weight_factor, /root/reference/src/flags.rs:570-575).
    */
  def weightFactor: Double = Obs.WeightFactor

  /** Van Vleck sample scale from the container constants:
    * 2·N·bscale where N = fine_chan_width_hz · int_time_s correlation
    * samples per fine channel (circular symmetry gives the factor 2;
    * reference get_vv_sample_scale,
    * /root/reference/src/van_vleck.rs:318-329). Fails like the
    * reference's BadNSamples when the product underflows one sample.
    */
  def vvSampleScale(bscale: Double = 0.5): Double = {
    val n2 = fineChanWidthHz * intTimeS * 2.0
    require(n2 >= 1.0, s"bad Van Vleck sample count: $n2 < 1")
    n2 * bscale
  }

  /** Fine channel width, Hz (metafits FINECHAN). */
  def fineChanWidthHz: Double = Obs.FineChanWidthHz

  /** Antenna count (metafits TILEDATA). */
  def nAnts: Int = Obs.NumAnts

  /** Total fine-channel count (metafits NCHANS). */
  def nChans: Int = Obs.NumChans

  /** Scan count (metafits NSCANS). */
  def nScans: Int = Obs.NumTimesteps

  /** Fine channels per coarse channel. */
  def fineChansPerCoarse: Int = Obs.FineChansPerCoarse

  /** GPS seconds of scan 0 (metafits GPSTIME). */
  def gpsStartS: Double = Obs.GpsStart.toDouble

  /** Centre frequency of fine channel 0, Hz. */
  def baseFreqHz: Double = Obs.BaseFreqHz

  /** Correlator version (MWAX metafits CORR_VER = 2) — drives the
    * passband auto-select (reference cli.rs:1420-1436) and the
    * Van Vleck legacy-only CLI check (cli.rs:1378-1388). The
    * synthetic observation models a modern MWAX correlator.
    */
  def mwaVersion: PfbTables.MwaVersion = PfbTables.CorrMwaxV2

  /** MWAX oversampled-PFB flag (metafits OVERSAMP) — selects the 2025
    * oversampled gain table under `--pfb-gains auto`.
    */
  def oversampled: Boolean = false

  /** Whether PFB deripple was already applied upstream (metafits
    * DERIPPLE) — passband auto-select becomes a no-op then
    * (reference cli.rs:1416-1418).
    */
  def derippleApplied: Boolean = false

  /** J2000 phase centre from the container (RAPHASE/DECPHASE, falling
    * back to the tile pointing), degrees; None when the container has
    * neither (the synthetic seam uses the fixed gate ephemeris).
    * Reference: RADec::from_mwalib_phase_or_pointing (cli.rs:1376).
    */
  def phaseCentreDeg: Option[(Double, Double)] = None

  /** Tile pointing centre (metafits RA/DEC), degrees — the
    * `--pointing-centre` target (reference cli.rs:1377).
    */
  def pointingCentreDeg: Option[(Double, Double)] = None
}

/** The deterministic synthetic observation (graft.model.Dims). */
object SynthDims extends MetaSource {
  def antenna(s: SparkSession): DataFrame = Dims.antenna(s)
  def timestep(s: SparkSession): DataFrame = Dims.timestep(s)
  def chan(s: SparkSession): DataFrame = Dims.chan(s)
  def baseline(s: SparkSession): DataFrame = Dims.baseline(s)
  def digitalGain(s: SparkSession): DataFrame = Dims.digitalGain(s)
  def flaggedAnts(s: SparkSession): Seq[Long] =
    Seq(Obs.FlaggedAnt.toLong)
}
