package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small dimension ("metadata") tables for the synthetic observation.
  *
  * These play the role of Birli's `MetafitsContext`-derived metadata:
  * antennas with per-pol electrical lengths and flagged bits
  * (/root/reference/src/corrections.rs:118-127, src/flags.rs:121-126),
  * timesteps with GPS epochs (/root/reference/src/flags.rs:168-170),
  * hierarchical coarse/fine channels (/root/reference/src/cli.rs:494-507),
  * per-(antenna, coarse-chan) digital gains
  * (/root/reference/src/corrections.rs:356-365), PFB passband gains
  * (/root/reference/src/passband_gains.rs), and DI calibration solutions
  * (/root/reference/src/io/aocal.rs:18-27).
  *
  * Every table is tiny (8–64 rows) and deterministic — a pure function of
  * the constants in [[Obs]] — so the DuckDB oracle can regenerate it from
  * a `range()` CTE bit-for-bit (see graft.oracle.OracleSql). At cluster
  * scale these are the broadcast side of every metadata join: Spark's
  * planner sees a sub-kilobyte local relation and picks
  * BroadcastHashJoin / constant-folds it, which is exactly the access
  * pattern the reference gets from shared-memory metadata lookups.
  *
  * All fractional literals are dyadic rationals (k/2^n) so that any
  * sum/difference downstream stays exact in IEEE doubles — that makes
  * Spark-vs-DuckDB comparison order-independent.
  */
object Dims {
  import Obs._

  // All dims here are MODEL-sized (8-128 rows, independent of corpus
  // SF), so every range is pinned to ONE partition: at default
  // parallelism each broadcast build ran as a 32-task job (~50 ms of
  // pure scheduling), and a vis-chain gate builds ~10 of these dims
  // sequentially before its first corpus job.

  /** Antenna table: flagged bit, per-pol electrical lengths, ENH position. */
  def antenna(spark: SparkSession): DataFrame =
    spark.range(0, NumAnts, 1, 1).select(
      col("id").as("ant"),
      (col("id") === FlaggedAnt).as("ant_flagged"),
      (lit(42.0) + col("id") * 13.25).as("elec_len_x_m"),
      (lit(43.5) + col("id") * 13.25).as("elec_len_y_m"),
      ((col("id") % 4) * 100.0 - 150.0).as("east_m"),
      (floor(col("id") / 4) * 100.0 - 50.0).as("north_m"),
      (lit(377.0) + col("id") * 0.5).as("height_m"))

  /** Timestep table with GPS epoch and the init/end quack flags
    * (reference finalise_flag_settings, /root/reference/src/flags.rs:165-172).
    */
  def timestep(spark: SparkSession): DataFrame =
    spark.range(0, NumTimesteps, 1, 1).select(
      col("id").as("t"),
      (lit(GpsStart) + col("id") * 2).as("gps_s"),
      (lit(GpsStart).cast("double") + col("id") * 2.0 + 1.0).as("centroid_s"),
      (col("id") < FlagInitSteps ||
        col("id") >= NumTimesteps - FlagEndSteps).as("ts_flag"))

  /** Fine-channel table: hierarchical (coarse, fine-in-coarse) indexing,
    * centre frequency, and the static channel flags — one edge channel on
    * each side of every coarse channel plus the DC bin at fpc/2
    * (reference flag_edge_channels /root/reference/src/cli.rs:1162-1169 and
    * DC flagging /root/reference/src/flags.rs:128-131).
    */
  def chan(spark: SparkSession): DataFrame =
    spark.range(0, NumChans, 1, 1).select(
      col("id").as("chan"),
      floor(col("id") / FineChansPerCoarse).as("cc"),
      (col("id") % FineChansPerCoarse).as("fc"),
      (lit(BaseFreqHz) + col("id") * FineChanWidthHz).as("freq_hz"))
      .withColumn("ch_flag",
        col("fc") === 0 || col("fc") === FineChansPerCoarse - 1 ||
          col("fc") === FineChansPerCoarse / 2)

  /** Baseline table: all unordered antenna pairs (incl. autos), with the
    * baseline flag = either antenna flagged
    * (reference get_baseline_flags, /root/reference/src/flags.rs:148-155).
    */
  def baseline(spark: SparkSession): DataFrame =
    baselineFrom(antenna(spark), NumAnts)

  /** Baseline table derived from ANY antenna table in the Dims layout
    * (synthetic or metafits-parsed); `bl = ant1 * nAnts + ant2`.
    */
  def baselineFrom(antenna: DataFrame, nAnts: Int): DataFrame = {
    val a = antenna.select(col("ant").as("ant1"),
      col("ant_flagged").as("f1"))
    val b = antenna.select(col("ant").as("ant2"),
      col("ant_flagged").as("f2"))
    a.crossJoin(b).where(col("ant1") <= col("ant2")).select(
      (col("ant1") * nAnts + col("ant2")).as("bl"),
      col("ant1"), col("ant2"),
      (col("ant1") === col("ant2")).as("auto"),
      (col("f1") || col("f2")).as("bl_flag"))
  }

  /** Per-(antenna, coarse-chan) digital gains, normalised to 64
    * (reference correct_digital_gains, /root/reference/src/corrections.rs:356-365).
    */
  def digitalGain(spark: SparkSession): DataFrame =
    spark.range(0, NumAnts.toLong * NumCoarse, 1, 1).select(
      floor(col("id") / NumCoarse).as("ant"),
      (col("id") % NumCoarse).as("cc"))
      .withColumn("m", (col("ant") * NumCoarse + col("cc")) % 16)
      .select(col("ant"), col("cc"),
        ((col("m") + 64).cast("double") / 64.0).as("gain_x"),
        ((col("m") + 65).cast("double") / 64.0).as("gain_y"))

  /** Per-fine-chan-in-coarse passband gain (already scrunched to the
    * observation resolution — the scrunch itself is
    * [[graft.ops.PassbandGains.scrunchGains]], tested against reference
    * semantics separately).
    */
  def pfbGain(spark: SparkSession): DataFrame =
    spark.range(0, FineChansPerCoarse, 1, 1).select(
      col("id").as("fc"),
      (((col("id") * 37) % 23 + 100).cast("double") / 112.0).as("pfb_gain"))

  /** Per-fine-chan passband gain from a PUBLISHED table
    * ([[PfbTables]]), auto-selected by correlator version and scrunched
    * to the observation resolution — the production path of the
    * reference's `--passband-gains auto`.
    */
  def pfbGainReal(spark: SparkSession,
                  version: PfbTables.MwaVersion = PfbTables.CorrMwaxV2,
                  oversampled: Boolean = false,
                  nFineChansPerCoarse: Int = FineChansPerCoarse)
      : DataFrame = {
    import spark.implicits._
    PfbTables.scrunched(version, oversampled, nFineChansPerCoarse)
      .zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toSeq
      .toDF("fc", "pfb_gain")
  }

  /** DI calibration solutions: one 2x2 complex Jones per (antenna,
    * coarse-chan) — i.e. calsol channel resolution coarser than the data,
    * exercising the channel_ratio chunking of the reference
    * (/root/reference/src/calibration.rs:76-103). Components are dyadic
    * rationals in [-1, 1.4].
    */
  def calsol(spark: SparkSession): DataFrame = {
    val base = spark.range(0, NumAnts.toLong * NumCoarse, 1, 1).select(
      floor(col("id") / NumCoarse).as("ant"),
      (col("id") % NumCoarse).as("cc"))
    val withJ = (0 until 8).foldLeft(base) { (df, k) =>
      df.withColumn(s"j$k",
        (((col("ant") * 29 + col("cc") * 13 + k * 7) % 39).cast("double")
          / 16.0 - 1.0))
    }
    withJ
  }
}
