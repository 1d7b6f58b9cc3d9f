package graft.model

/** Observation-geometry constants for the deterministic synthetic
  * observation every oracle-checked query runs against.
  *
  * Mirrors the role of Birli's `MetafitsContext` correlator constants
  * (reference: /root/reference/src/flags.rs:133, src/van_vleck.rs:318-329):
  * integration time, fine-channel width, fine-chans-per-coarse, and the
  * flag-init / flag-end quack windows. The numerology (2 s / 40 kHz, obs id
  * 1254670392) follows the reference's small averaging fixture
  * (/root/reference/tests/data README, `1254670392_avg`).
  *
  * Everything here is a plan-time literal: Catalyst constant-folds these
  * into the generated code, exactly as Birli folds correlator constants
  * into its kernels.
  */
object Obs {
  val NumTimesteps: Int = 16
  val NumAnts: Int = 8
  val NumCoarse: Int = 4
  val FineChansPerCoarse: Int = 8
  val NumChans: Int = NumCoarse * FineChansPerCoarse

  /** Integration time, seconds (reference `corr_int_time_ms`). */
  val IntTimeS: Double = 2.0

  /** Fine channel width, Hz (reference `corr_fine_chan_width_hz`). */
  val FineChanWidthHz: Double = 40000.0

  /** Centre frequency of global channel 0, Hz. */
  val BaseFreqHz: Double = 1.5e8

  /** GPS seconds of timestep 0 (obs id of the reference avg fixture). */
  val GpsStart: Long = 1254670392L

  val SpeedOfLight: Double = 299792458.0

  /** Timesteps flagged at the start/end of the common range
    * (reference flag_init/flag_end, /root/reference/src/flags.rs:165-172).
    */
  val FlagInitSteps: Int = 1
  val FlagEndSteps: Int = 1

  /** The one metafits-flagged antenna in the synthetic array
    * (reference per-antenna `flagged` bit, /root/reference/src/flags.rs:121-126).
    */
  val FlaggedAnt: Int = 7

  /** Cotter-legacy weight factor:
    * (fine_chan_width / 10 kHz) * (int_time / 1 s)
    * (reference get_weight_factor, /root/reference/src/flags.rs:570-575).
    */
  val WeightFactor: Double = (FineChanWidthHz / 10000.0) * (IntTimeS / 1.0)

  /** Phase-centre direction cosines for the simplified (non-precessing)
    * geometric delay model used by the oracle-checked geometry query.
    * Unit vector components toward the phase centre in the local ENH frame.
    */
  val PhaseCentreE: Double = 0.25
  val PhaseCentreN: Double = 0.5
  val PhaseCentreH: Double = 0.828125 // chosen so e^2+n^2+h^2 < 1 is irrelevant; dyadic
}
