package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI-style ad-hoc overrides layered over any [[MetaSource]] — the
  * Spark analogue of the reference CLI's FlagContext mutations
  * (--flag-times / --flag-antenna / --quack-time / --flag-edge-chans,
  * /root/reference/src/cli.rs:1057-1169). Each decorator rewrites ONE
  * dimension table (all broadcast-sized) and delegates everything
  * else, so stacked decorators compose and the fact-table plans are
  * untouched.
  */
object MetaDecorators {

  /** Shared delegation base: every table from `inner` unless
    * overridden.
    */
  trait Delegating extends MetaSource {
    def inner: MetaSource
    def antenna(s: SparkSession): DataFrame = inner.antenna(s)
    def timestep(s: SparkSession): DataFrame = inner.timestep(s)
    def chan(s: SparkSession): DataFrame = inner.chan(s)
    def baseline(s: SparkSession): DataFrame = inner.baseline(s)
    def digitalGain(s: SparkSession): DataFrame = inner.digitalGain(s)
    def flaggedAnts(s: SparkSession): Seq[Long] = inner.flaggedAnts(s)
    // EVERY scalar accessor must delegate — a miss here silently
    // reverts a real container's constants to the synthetic defaults
    // the moment any decorator is stacked
    override def cableApplied: Boolean = inner.cableApplied
    override def geometryApplied: Boolean = inner.geometryApplied
    override def intTimeS: Double = inner.intTimeS
    override def weightFactor: Double = inner.weightFactor
    override def vvSampleScale(bscale: Double): Double =
      inner.vvSampleScale(bscale)
    override def fineChanWidthHz: Double = inner.fineChanWidthHz
    override def nAnts: Int = inner.nAnts
    override def nChans: Int = inner.nChans
    override def nScans: Int = inner.nScans
    override def fineChansPerCoarse: Int = inner.fineChansPerCoarse
    override def gpsStartS: Double = inner.gpsStartS
    override def baseFreqHz: Double = inner.baseFreqHz
    override def mwaVersion: PfbTables.MwaVersion = inner.mwaVersion
    override def oversampled: Boolean = inner.oversampled
    override def derippleApplied: Boolean = inner.derippleApplied
    override def phaseCentreDeg: Option[(Double, Double)] =
      inner.phaseCentreDeg
    override def pointingCentreDeg: Option[(Double, Double)] =
      inner.pointingCentreDeg
  }

  /** Override ONLY the fine-channel width — the seam a legacy 10 kHz
    * container presents (128 fine channels per coarse vs MWAX's 64 or
    * fewer; the reference reads the width from the metafits the same
    * way). Deliberately does NOT rewrite `chan`/`nChans`: the mwaf
    * sink, the one consumer that exists for this decorator, derives
    * its dense grid from timestep/baseline + this width alone
    * (MwafForeignSpec's contract); a pipeline-wide width change is a
    * different MetaSource, not a decorator.
    */
  final case class ChanWidth(inner: MetaSource, fpc: Int)
      extends Delegating {
    require(fpc >= 1, s"fpc must be >= 1, got $fpc")
    override def fineChansPerCoarse: Int = fpc
  }

  /** Re-derive static channel flags at a chosen edge width: fc within
    * `edge` of either coarse-channel boundary, plus the DC centre
    * (reference --flag-edge-chans, cli.rs:1162-1169).
    */
  final case class EdgeFlag(inner: MetaSource, edge: Int)
      extends Delegating {
    override def chan(s: SparkSession): DataFrame = {
      val fpc = inner.fineChansPerCoarse
      inner.chan(s).withColumn("ch_flag",
        col("fc") < edge || col("fc") >= fpc - edge ||
          col("fc") === fpc / 2)
    }
  }

  /** Additionally flag specific timesteps (reference --flag-times). */
  final case class FlagTimes(inner: MetaSource, times: Seq[Long])
      extends Delegating {
    override def timestep(s: SparkSession): DataFrame =
      inner.timestep(s).withColumn("ts_flag",
        col("ts_flag") || col("t").isin(times: _*))
  }

  /** Additionally flag antennas (reference --flag-antenna): the
    * antenna bit, every baseline touching one, and the Van Vleck skip
    * list all see the union.
    */
  final case class FlagAnts(inner: MetaSource, ants: Seq[Long])
      extends Delegating {
    override def antenna(s: SparkSession): DataFrame =
      inner.antenna(s).withColumn("ant_flagged",
        col("ant_flagged") || col("ant").isin(ants: _*))
    override def baseline(s: SparkSession): DataFrame =
      inner.baseline(s).withColumn("bl_flag",
        col("bl_flag") || col("ant1").isin(ants: _*) ||
          col("ant2").isin(ants: _*))
    override def flaggedAnts(s: SparkSession): Seq[Long] =
      (inner.flaggedAnts(s) ++ ants).distinct.sorted
  }

  /** Flag every autocorrelation baseline (reference --flag-autos,
    * cli.rs:1054-1056): the ad-hoc alternative to dropping autos from
    * the selection entirely (--no-autos).
    */
  final case class FlagAutos(inner: MetaSource) extends Delegating {
    override def baseline(s: SparkSession): DataFrame =
      inner.baseline(s).withColumn("bl_flag",
        col("bl_flag") || col("ant1") === col("ant2"))
  }

  /** Clear the container's own antenna flags (reference
    * --no-flag-metafits, cli.rs:1029-1033) — ad-hoc --flag-antennas
    * stacked OUTSIDE this decorator still apply, exactly the
    * reference's clear-then-add order.
    */
  final case class ClearAntFlags(inner: MetaSource) extends Delegating {
    override def antenna(s: SparkSession): DataFrame =
      inner.antenna(s).withColumn("ant_flagged", lit(false))
    override def baseline(s: SparkSession): DataFrame =
      inner.baseline(s).withColumn("bl_flag", lit(false))
    override def flaggedAnts(s: SparkSession): Seq[Long] = Nil
  }

  /** Override the quack window: flag the first ceil(quackS/intTime)
    * timesteps IN ADDITION to the container's own flags (reference
    * --quack-time, additive like the CLI's flag-OR).
    */
  final case class QuackTime(inner: MetaSource, quackS: Double)
      extends Delegating {
    override def timestep(s: SparkSession): DataFrame = {
      val steps = math.ceil(quackS / inner.intTimeS).toLong
      inner.timestep(s).withColumn("ts_flag",
        col("ts_flag") || col("t") < steps)
    }
  }

  /** Flag the first `n` timesteps (reference --flag-init-steps). */
  final case class FlagInitSteps(inner: MetaSource, n: Int)
      extends Delegating {
    override def timestep(s: SparkSession): DataFrame =
      inner.timestep(s).withColumn("ts_flag",
        col("ts_flag") || col("t") < n)
  }

  /** Flag the last `n` timesteps (reference --flag-end-steps). */
  final case class FlagEndSteps(inner: MetaSource, n: Int)
      extends Delegating {
    override def timestep(s: SparkSession): DataFrame =
      inner.timestep(s).withColumn("ts_flag",
        col("ts_flag") || col("t") >= inner.nScans - n)
  }

  /** Flag whole coarse channels (reference --flag-coarse-chans). */
  final case class FlagCoarseChans(inner: MetaSource, ccs: Seq[Long])
      extends Delegating {
    override def chan(s: SparkSession): DataFrame =
      inner.chan(s).withColumn("ch_flag",
        col("ch_flag") || col("cc").isin(ccs: _*))
  }

  /** Flag fine-channel indices within every coarse channel
    * (reference --flag-fine-chans).
    */
  final case class FlagFineChans(inner: MetaSource, fcs: Seq[Long])
      extends Delegating {
    override def chan(s: SparkSession): DataFrame =
      inner.chan(s).withColumn("ch_flag",
        col("ch_flag") || col("fc").isin(fcs: _*))
  }

  /** Force the DC-centre flag ON (reference --flag-dc,
    * cli.rs:723-726 — overrides the MWAX default of leaving the
    * centre fine channel unflagged).
    */
  final case class DcFlag(inner: MetaSource) extends Delegating {
    override def chan(s: SparkSession): DataFrame = {
      val fpc = inner.fineChansPerCoarse
      inner.chan(s).withColumn("ch_flag",
        col("ch_flag") || col("fc") === fpc / 2)
    }
  }

  /** Clear the DC-centre flag (reference --no-flag-dc — MWAX data has
    * no DC artefact): keep every other static flag bit.
    */
  final case class NoDcFlag(inner: MetaSource) extends Delegating {
    override def chan(s: SparkSession): DataFrame = {
      val fpc = inner.fineChansPerCoarse
      inner.chan(s).withColumn("ch_flag",
        col("ch_flag") && !(col("fc") === fpc / 2))
    }
  }
}
