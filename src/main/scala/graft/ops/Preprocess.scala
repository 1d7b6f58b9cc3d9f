package graft.ops

import graft.model.{Dims, Obs}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The fixed preprocessing pipeline
  * (`PreprocessContext::preprocess`, /root/reference/src/preprocessing.rs:178-361).
  *
  * Stage order is a SEMANTIC CONTRACT (preprocessing.rs §kernel order):
  *   Van Vleck → cable → digital gains → PFB passband →
  *   RFI flagging → geometry → DI calibration
  * and each stage is conditional exactly as the reference's CLI decides
  * (skip cable/geometry when the metafits says already applied,
  * /root/reference/src/cli.rs:1389-1399, 1444-1452; Van Vleck only for
  * the legacy correlator, cli.rs:1378-1388).
  *
  * Each member is a pure DataFrame => DataFrame transform, so the whole
  * pipeline is `df.transform(...)` composition — Catalyst fuses all the
  * expression-only stages (C1, C3, C4, C6) into ONE projection over the
  * scan (CollapseProject), which is why the expression-first design beats
  * a UDF-per-stage port: the fused plan reads each row once.
  */
case class Preprocess(vanVleck: Boolean = false,
                      cable: Boolean = true,
                      digitalGains: Boolean = true,
                      passband: Boolean = true,
                      rfi: Boolean = false,
                      geometry: Boolean = true,
                      calibrate: Boolean = true,
                      sampleScale: Double = 2.0,
                      // production knobs: a PUBLISHED gain table
                      // auto-selected by correlator version (None =
                      // the synthetic oracle-gated table), and the
                      // apparent-place ephemeris for geometry
                      pfbVersion: Option[graft.model.PfbTables.MwaVersion]
                        = None,
                      pfbOversampled: Boolean = false,
                      // an EXTERNAL (fc, pfb_gain) table applied as an
                      // OUTPUT correction in place of a built-in PFB
                      // table; takes precedence over pfbVersion. This
                      // is an explicit opt-in — a Lua strategy's
                      // apply_bandpass file must NOT land here (the
                      // reference runs strategies on an ImageSet COPY,
                      // flags.rs RunExisting, so only the flag mask
                      // propagates back) — use rfiBandpass for that.
                      pfbExternal: Option[DataFrame] = None,
                      // an EXTERNAL (fc, pfb_gain) table applied ONLY
                      // to the amplitude grid fed to RFI detection —
                      // the semantics of a strategy's
                      // aoflagger.apply_bandpass(data, file): the
                      // reference executes it on the detection copy
                      // (flags.rs:406-412 via RunExisting) and only
                      // flags flow back; output DATA and WEIGHTS are
                      // never touched by it
                      rfiBandpass: Option[DataFrame] = None,
                      apparentGeometry: Boolean = false,
                      // metadata seam: SynthDims or a parsed metafits
                      // (graft.sources.MetafitsMeta)
                      meta: graft.model.MetaSource =
                        graft.model.SynthDims,
                      rfiStrategy: RfiStrategy = RfiStrategy(),
                      // RFI stage shape: fused (detection group emits
                      // the flagged rows — one corpus pass, one `bl`
                      // exchange) vs join (detect cells, join the mask
                      // back on (bl, t, chan) — recomputes the
                      // upstream chain for the probe side and pays two
                      // extra exchanges). Fused measured faster at
                      // sf0.1 (SCALE.md round-15b); identical output.
                      rfiFused: Boolean = true,
                      // C5 iteration-cap policy: true (default) =
                      // reference bit-parity (abandon to khat at the
                      // cap); false = engine-stable sub-nano acceptance
                      vvReferenceCapFallback: Boolean = true,
                      // C6 solutions source: an MWAOCAL binary file
                      // (the reference's production input) instead of
                      // the synthetic calsol dimension
                      aocalPath: Option[String] = None,
                      // J2000 phase centre override (radians) for the
                      // apparent-place geometry (reference
                      // --phase-centre); None keeps the fixed gate
                      // ephemeris constants
                      phaseCentre: Option[(Double, Double)] = None,
                      // array position override (lon, lat radians) for
                      // the apparent-place geometry (reference
                      // --emulate-cotter swaps in Cotter's constants,
                      // cli.rs:1353-1360)
                      arrayPos: Option[(Double, Double)] = None) {

  def apply(spark: SparkSession, vis: DataFrame): DataFrame = {
    // metafits auto-skip: the container says these delays are already
    // applied upstream, so the stage must not run twice (reference CLI
    // decisions, /root/reference/src/cli.rs:1389-1399, 1444-1452)
    val doCable = cable && !meta.cableApplied
    val doGeometry = geometry && !meta.geometryApplied
    val antenna = meta.antenna(spark)
    val par = spark.sessionState.conf.numShufflePartitions
    // ONE corpus exchange for the whole kernel-bearing chain (guide
    // §2.4): hash(bl, par) at the top (a) spreads the Van Vleck cross
    // kernel — with σ broadcast there is otherwise NO exchange
    // between the scan and RFI, so a narrow scan runs the whole
    // Newton/Simpson chain on its own width (measured: 4.7 s on 3
    // tasks at sf0.1/c32) — (b) satisfies RFI's groupBy(bl)
    // clustering, so its own pinned exchange is skipped, and (c)
    // satisfies the averaging groupBy(t_out, bl, c_out) clustering
    // (bl ⊆ keys), so the chain's output aggregate is exchange-free
    // too. Chains without kernels (pure fused projections) keep the
    // scan's own layout — an exchange would be pure cost there.
    val kernelBearing = rfi || vanVleck
    val spreadVis =
      if (kernelBearing && par > 0)
        vis.repartition(par, org.apache.spark.sql.functions.col("bl"))
      else vis
    val pfb = pfbExternal.getOrElse(pfbVersion
      .map(v => Dims.pfbGainReal(spark, v, pfbOversampled,
        meta.fineChansPerCoarse))
      .getOrElse(Dims.pfbGain(spark)))
    def uvw = uvwTable(spark)
    val stages: Seq[(Boolean, DataFrame => DataFrame)] = Seq(
      (vanVleck, df => VanVleck(df, meta.flaggedAnts(spark),
        sampleScale, vvReferenceCapFallback,
        // σ-solve width: CPU-bound per cell, see sigmaTable's doc.
        // A model-sized shuffle even over bucketed mirrors — the
        // Newton spread is worth the trivial extra exchange there.
        spark.sessionState.conf.numShufflePartitions,
        // broadcast σ when the CONTAINER bounds it under the
        // threshold (VanVleck.sigmaFitsBroadcast — Catalyst's own
        // estimate never fires here)
        VanVleck.sigmaFitsBroadcast(meta, spark))),
      (doCable, df => CableCorrection(df, antenna)),
      (digitalGains, df => DigitalGains(df, meta.digitalGain(spark))),
      (passband, df => PassbandGains(df, pfb)),
      (rfi, df => applyRfi(df)),
      (doGeometry, df => GeometryCorrection(df, uvw)),
      (calibrate, df => Calibration(df, calsolTable(spark))))
    stages.foldLeft(spreadVis) { case (df, (enabled, stage)) =>
      if (enabled) df.transform(stage) else df
    }
  }

  /** The per-(t, ant) partial-UVW table this pipeline's geometry stage
    * uses — exposed so the uvfits/MS sinks can write group parameters
    * CONSISTENT with the phases the geometry stage tracked (a sink
    * computing its own default-centre table would emit UVW
    * inconsistent with the rotated DATA).
    */
  def uvwTable(spark: SparkSession): DataFrame = {
    val (raC, decC) = phaseCentre.getOrElse(
      (GeometryCorrection.AppRaJ2000, GeometryCorrection.AppDecJ2000))
    val (lonA, latA) = arrayPos.getOrElse(
      (GeometryCorrection.AppLonRad, GeometryCorrection.AppLatRad))
    if (apparentGeometry || phaseCentre.isDefined || arrayPos.isDefined)
      GeometryCorrection.partUvwAstro(spark, meta.timestep(spark),
        meta.antenna(spark), lonA, latA, raC, decC,
        GeometryCorrection.AppDut1Sec, apparent = true)
    else GeometryCorrection.partUvw(meta.timestep(spark),
      meta.antenna(spark))
  }

  /** DI solutions: from the MWAOCAL binary when a path is given
    * (reference AOCalSols, calibration.rs:41-131), else the synthetic
    * calsol dimension. Both land in the same (ant, cc, j0..j7)
    * broadcast layout.
    */
  private def calsolTable(spark: SparkSession): DataFrame =
    aocalPath match {
      case Some(p) =>
        graft.sources.AOCalReader.toDataFrame(spark,
          graft.sources.AOCalReader.read(p))
          .withColumnRenamed("cal_chan", "cc")
      case None => Dims.calsol(spark)
    }

  /** RFI stage: detect per-baseline, OR the detections back into the
    * frame's flag column (reference flag-OR mode, flags.rs:414-418).
    *
    * When the strategy carries an apply_bandpass file ([[rfiBandpass]]),
    * the gains divide a detection-only COPY of the visibilities before
    * the kernel runs — the reference hands AOFlagger an ImageSet copy
    * and only the resulting mask propagates (flags.rs RunExisting) —
    * so the frame this method RETURNS carries the original,
    * un-bandpassed data with only the flag column updated.
    */
  private def applyRfi(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // groupParallelism = 0: the chain's top-level hash(bl, par)
    // repartition (apply) already satisfies the detection grouping,
    // so pinning here would only add a second bl exchange
    if (rfiFused)
      return RfiFlag.detectAndFlag(df, rfiStrategy, rfiBandpass)
    val detectInput = rfiBandpass match {
      case Some(pb) =>
        (0 until 8).foldLeft(df.join(broadcast(pb), Seq("fc"))) {
          (d, k) => d.withColumn(s"v$k", col(s"v$k") / col("pfb_gain"))
        }.drop("pfb_gain")
      case None => df
    }
    val rfi = RfiFlag(detectInput, rfiStrategy)
    df.join(rfi, Seq("bl", "t", "chan"), "left")
      .withColumn("flag", col("flag") || coalesce(col("rfi"), lit(false)))
      .drop("rfi")
  }
}
