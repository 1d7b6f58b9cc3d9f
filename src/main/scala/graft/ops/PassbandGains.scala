package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4 `correct_coarse_passband_gains`
  * (/root/reference/src/corrections.rs:453-522).
  *
  * Two halves, exactly as the reference splits them:
  *  1. [[scrunchGains]] — a pure driver-side function collapsing the
  *     ultrafine published PFB gain table to the observation's
  *     fine-channel resolution (corrections.rs:576-646);
  *  2. application — per fine-chan-in-coarse: vis /= gain,
  *     weight *= gain (corrections.rs:504-519), a broadcast join on the
  *     8-row scrunched-gain dimension + division/multiply expressions.
  */
object PassbandGains {

  /** Port of `scrunch_gains` (corrections.rs:576-646).
    *
    * - `Simple` (legacy correlator): plain mean over each contiguous
    *   window of `factor` ultrafine gains.
    * - `CenterSymmetric` (MWAX): windows are centred on the output
    *   channel, wrap around the coarse channel, and half-weight their two
    *   edge samples; odd factors take (factor+1) samples with the two
    *   outermost at weight 1/2, even factors take (factor+1) samples with
    *   the ends at 1/2 (corrections.rs:606-630 odd/even cases).
    */
  def scrunchGains(ultrafine: Array[Double], fscrunch: Int,
                   centerSymmetric: Boolean): Array[Double] = {
    val n = ultrafine.length
    require(n % fscrunch == 0, s"$n not divisible by $fscrunch")
    val out = n / fscrunch
    if (fscrunch == 1) return ultrafine.clone()
    // (offset, weight) window relative to scrunched_chan * fscrunch —
    // the reference's three CenterSymmetric cases keyed on
    // (scrunched_length % 2, fscrunch % 2) (corrections.rs:606-630),
    // wrapping with euclidean mod over the whole table.
    val offsetWeights: Seq[(Int, Double)] =
      if (!centerSymmetric)
        (0 until fscrunch).map(w => (w, 1.0 / fscrunch))
      else (out % 2, fscrunch % 2) match {
        case (0, 0) => // even channels, even fscrunch: f+1 window,
          // half-weighted edges, centred
          (0 to fscrunch).map(w => (w - fscrunch / 2,
            (if (w == 0 || w == fscrunch) 0.5 else 1.0) / fscrunch))
        case (0, 1) => // even channels, odd fscrunch: f window, equal
          (0 until fscrunch).map(w => (w - (fscrunch - 1) / 2,
            1.0 / fscrunch))
        case _ => // odd channels: f+1 window starting AT the centre,
          // half-weighted edges
          (0 to fscrunch).map(w => (w,
            (if (w == 0 || w == fscrunch) 0.5 else 1.0) / fscrunch))
      }
    Array.tabulate(out) { sc =>
      offsetWeights.foldLeft(0.0) { case (acc, (off, wt)) =>
        acc + ultrafine(math.floorMod(fscrunch * sc + off, n)) * wt
      }
    }
  }

  /** Load an EXTERNAL per-fine-channel bandpass file — the gains an
    * AOFlagger Lua strategy applies via `aoflagger.apply_bandpass(data,
    * file)` (surfaced by [[LuaStrategy]] as `Translation.bandpassFiles`)
    * — as a (fc, pfb_gain) table.
    *
    * Where the table lands matters: the reference executes a strategy
    * on an ImageSet COPY of the visibilities (flags.rs RunExisting)
    * and only the flag mask propagates back, so a strategy's
    * apply_bandpass corrects DETECTION amplitudes only — route it via
    * `Preprocess.rfiBandpass` (the CLI does). Routing it through the
    * output passband stage (`Preprocess.pfbExternal`) is a separate,
    * explicit opt-in that DOES rescale output data and weights.
    *
    * Format: one gain per line (fine channel order), `#`/`--` comments;
    * the line count must equal `fineChansPerCoarse` — a wrong-sized
    * table fails loudly rather than recycling through a silent modulo.
    *
    * Double-application guard: a pipeline whose passband stage already
    * applies built-in PFB gains has corrected the data BEFORE the RFI
    * stage sees it, so applying the strategy's bandpass on top (in
    * either role) corrects twice. Callers pass whether the pipeline's
    * passband stage is enabled; the load REFUSES in that case, naming
    * both sources, so a migrating user must explicitly pick one.
    */
  def external(spark: org.apache.spark.sql.SparkSession, path: String,
               fineChansPerCoarse: Int,
               pipelineAppliesPfb: Boolean): DataFrame = {
    require(!pipelineAppliesPfb,
      s"strategy bandpass file '$path' refused: the pipeline's passband " +
        "stage already applies PFB gains — applying both would " +
        "double-correct. Disable the passband stage (CLI " +
        "--no-passband / Preprocess(passband = false)) to use the " +
        "strategy's file, or drop apply_bandpass from the strategy.")
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).open(p)
    val text =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        bytes.toString("UTF-8")
      } finally in.close()
    val gains = text.linesIterator
      .map(_.split("#|--", 2).head.trim)
      .filter(_.nonEmpty)
      .map(_.toDouble)
      .toArray
    require(gains.length == fineChansPerCoarse,
      s"bandpass file '$path' has ${gains.length} gains, expected " +
        s"$fineChansPerCoarse (one per fine channel in a coarse)")
    require(gains.forall(g => g > 0 && !g.isInfinite),
      s"bandpass file '$path' must hold finite positive gains")
    import spark.implicits._
    gains.zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toSeq
      .toDF("fc", "pfb_gain")
  }

  /** Apply scrunched per-fine-chan gains: vis /= gain, weight *= gain.
    * `pfbGain` provides (fc, pfb_gain).
    */
  def apply(vis: DataFrame, pfbGain: DataFrame): DataFrame = {
    val joined = vis.join(broadcast(pfbGain), Seq("fc"))
    // one withColumns (not a per-column fold): chained withColumn
    // re-analyzes the whole plan per step
    val divided = joined.withColumns(
      (0 until 8).map(k => s"v$k" -> col(s"v$k") / col("pfb_gain"))
        .toMap)
    val weighted =
      if (divided.columns.contains("weight"))
        divided.withColumn("weight", col("weight") * col("pfb_gain"))
      else divided
    weighted.drop("pfb_gain")
  }
}
