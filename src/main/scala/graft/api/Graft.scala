package graft.api

import graft.model.{Dims, Obs}
import graft.ops._
import graft.sinks.{Sinks, UvfitsWriter}
import graft.synth.VisSynth
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row for API edges (SURVEY §1.6: `Dataset[Vis]` where type
  * safety helps; plain DataFrame inside operators where codegen rules).
  */
case class Vis(t: Long, ant1: Long, ant2: Long, bl: Long, cc: Long,
               fc: Long, chan: Long, freq_hz: Double,
               v0: Double, v1: Double, v2: Double, v3: Double,
               v4: Double, v5: Double, v6: Double, v7: Double,
               w: Double)

/** The library-facing fluent API — the Spark equivalent of the
  * reference's library path (/root/reference/src/lib.rs:8-84,
  * examples/preprocess.rs:30-110):
  *
  * {{{
  * CorrelatorContext::new        ->  Graft(spark).observation(dir)
  * VisSelection::from_mwalib     ->  .selectTime(a,b).selectAnts(..)
  * FlagContext + set_flags       ->  .withDefaultFlags()
  * get_weight_factor/flag_to_w   ->  .withWeights()
  * PreprocessContext::preprocess ->  .preprocess(Preprocess(...))
  * write_uvfits / write_flags    ->  .averaged(2,2).writeUvfits(path)
  * }}}
  *
  * Every step is lazy DataFrame composition; nothing executes until a
  * sink or action.
  */
case class Graft(spark: SparkSession,
                 meta: graft.model.MetaSource = graft.model.SynthDims) {

  /** Switch the metadata seam to a parsed metafits — every downstream
    * flag/correction table then comes from the real container.
    */
  def withMetafits(path: String): Graft =
    copy(meta = graft.sources.MetafitsMeta(
      graft.sources.MetafitsReader.read(path,
        spark.sparkContext.hadoopConfiguration)))

  /** Open the synthetic observation rooted at a testdata dir. */
  def observation(dir: String): VisFrame =
    VisFrame(spark, VisSynth.vis(spark, dir), meta)

  /** Open a directory of GBX1 raw files (S1 ingest path). */
  def rawObservation(dir: String, nAnts: Int): VisFrame =
    VisFrame(spark, graft.sources.GpuboxSource.read(spark, dir, nAnts),
      meta)

  /** Open a directory of FITS gpubox files (the real container). */
  def fitsObservation(dir: String, nAnts: Int): VisFrame =
    VisFrame(spark, graft.sources.FitsGpubox.read(spark, dir, nAnts),
      meta)
}

case class VisFrame(spark: SparkSession, df: DataFrame,
                    meta: graft.model.MetaSource =
                      graft.model.SynthDims) {

  private def next(d: DataFrame): VisFrame = copy(df = d)

  // -- selection (P1–P4) ------------------------------------------------
  def selectTime(from: Long, to: Long): VisFrame =
    next(FlagOps.selTime(df, from, to))
  def selectAnts(ants: Seq[Long]): VisFrame =
    next(FlagOps.selAnts(df, ants))
  def withoutFlaggedAnts(): VisFrame =
    next(FlagOps.dropFlaggedAnts(df, meta.antenna(spark)))
  def withoutAutos(): VisFrame = next(FlagOps.dropAutos(df))

  /** Restrict to a CLI-style coarse-channel range spec, e.g.
    * `"0-1, 3"` (reference ChannelRanges, cli.rs:154-240). Throws on a
    * malformed spec, mirroring the CLI's InvalidRangeSpecifier.
    */
  def selectChannelRanges(spec: String): VisFrame = {
    val ranges = ChannelRanges.parse(spec)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val cond = ranges
      .map { case (lo, hi) => col("cc").between(lo, hi) }
      .reduce(_ || _)
    next(df.where(cond))
  }

  /** Canonicalise a raw-container frame (GBX1 / FITS gpubox ingest):
    * centre frequency from the chan dimension, unit pre-weight (raw
    * correlator samples carry no weight — the weight factor enters at
    * [[withWeights]]). The ingest's missing-HDU flag column survives
    * and is OR'd with the static flags by [[withDefaultFlags]].
    */
  def withRawDefaults(): VisFrame =
    next(df
      .join(org.apache.spark.sql.functions.broadcast(
        meta.chan(spark).select("chan", "freq_hz")), Seq("chan"))
      .withColumn("w", lit(1.0)))

  // -- flags / weights (F, W) ------------------------------------------
  def withDefaultFlags(): VisFrame =
    next(FlagOps.setFlags(df, meta.timestep(spark), meta.chan(spark),
      meta.baseline(spark)))
  def withWeights(wf: Double = Obs.WeightFactor): VisFrame =
    next(WeightOps.flagToWeight(df, wf))

  // -- corrections ------------------------------------------------------
  def preprocess(p: Preprocess = Preprocess()): VisFrame =
    next(p(spark, df))

  // -- aggregation / sinks ---------------------------------------------
  def averaged(avgTime: Int, avgFreq: Int): DataFrame =
    Averaging.avgTimeFreq(df, avgTime, avgFreq)

  /** uvfits export with real UVW group parameters (reference wrapper
    * /root/reference/src/io/mod.rs:392-467). Pass `uvw` to keep the
    * group parameters consistent with a non-default phase tracking
    * (e.g. [[graft.ops.Preprocess.uvwTable]]); the default is the
    * metadata seam's mean-place table. `withUvw = false` writes a
    * structure-only file with zeroed parameters. Timestamps and the
    * integration time come from the seam's container constants.
    */
  def writeUvfits(path: String, avgTime: Int = 2, avgFreq: Int = 2,
                  withUvw: Boolean = true,
                  uvw: Option[DataFrame] = None): Long = {
    val table = if (!withUvw) None
    else uvw.orElse(Some(GeometryCorrection.partUvw(
      meta.timestep(spark), meta.antenna(spark))))
    UvfitsWriter.write(averaged(avgTime, avgFreq), path, table,
      meta.intTimeS, avgTime, meta.gpsStartS,
      antenna = Some(meta.antenna(spark)),
      baseFreqHz = meta.baseFreqHz)
  }

  /** MS container export (directory of casacore-shaped tables) — UVW
    * and antenna dims from the metadata seam (override `uvw`/`phaseDir`
    * for non-default phase tracking), same frames as the parquet
    * mirror ([[graft.sinks.MsWriter]]).
    */
  def writeMs(dir: String, avgTime: Int = 2, avgFreq: Int = 2,
              uvw: Option[DataFrame] = None,
              phaseDir: Option[(Double, Double)] = None): Long = {
    val table = uvw.getOrElse(GeometryCorrection.partUvw(
      meta.timestep(spark), meta.antenna(spark)))
    graft.sinks.MsContainer.write(averaged(avgTime, avgFreq), table,
      meta.antenna(spark), dir, avgTime, avgFreq, meta, phaseDir)
  }

  def writeFlagOccupancy(): DataFrame = Sinks.mwafOccupancy(df)

  def writeMwaf(dir: String,
                template: String = "flags_%%.mwaf"): Map[Long, Long] =
    graft.sinks.MwafWriter.write(df, dir, template, meta = meta)

  /** Picket-fence fan-out (reference run_ranges,
    * /root/reference/src/cli.rs:1524-1574): derive contiguous
    * coarse-channel ranges from the data, then write one suffixed
    * parquet output per range. Range discovery is a tiny aggregate;
    * each per-range write prunes its partitions off the same plan.
    */
  def writeRanges(outBase: String): Seq[(Long, Long, String)] = {
    val ranges = FlagOps.picketRanges(df.select("cc").distinct())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    ranges.toSeq.map { case (lo, hi) =>
      val path = s"$outBase/ch${lo}-${hi}"
      df.where(col("cc").between(lo, hi))
        .write.mode("overwrite").parquet(path)
      (lo, hi, path)
    }
  }

  /** Typed edge: expose the current frame as Dataset[Vis] (requires the
    * canonical pre-flag column set).
    */
  def typed: Dataset[Vis] = {
    import spark.implicits._
    df.select("t", "ant1", "ant2", "bl", "cc", "fc", "chan", "freq_hz",
      "v0", "v1", "v2", "v3", "v4", "v5", "v6", "v7", "w").as[Vis]
  }
}
