package graft

import graft.api.Graft
import graft.model.MetaSource
import graft.ops.Preprocess
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production command-line surface — the Spark twin of the
  * reference's clap CLI (/root/reference/src/cli.rs:622-821): open an
  * observation, switch the metadata seam to a metafits container,
  * select, flag, preprocess, average, and write sinks — with the
  * container-driven auto-skip decisions the reference logs
  * (cli.rs:1389-1399 cable, :1444-1452 geometry).
  *
  * Usage:
  * {{{
  * graft.Cli (-d <dataDir> | --gpubox <fitsDir> | <gpubox.fits>...)
  *   [-m|--metafits <metafits>]
  *   [-u|--uvfits-out <out.uvfits>]
  *   [-M|--ms-out <out.ms>] [--flag-out <mwafDir>]
  *   [-f|--flag-template <path_%%.mwaf>]
  *   [--flag-strategy|--aoflagger-strategy <file>]   (.lua files are
  *     translated via [[graft.ops.LuaStrategy]], unmapped calls
  *     logged; anything else parses as the native key=value format)
  *   [--dry-run] [--no-draw-progress] [--provided-chan-ranges]
  *   [--flag-init SEC] [--flag-end SEC] [--flag-dc]
  *   [--aocal <solutions.bin>] [--sel-time FROM TO] [--sel-ants A,B,...]
  *   [--sel-chan-ranges SPEC] [--no-autos] [--no-sel-flagged-ants]
  *   [--avg-time N] [--avg-freq N] [--avg-time-res SEC]
  *   [--avg-freq-res KHZ] [--flag-edge-chans N] [--flag-times T,...]
  *   [--flag-antennas A,...] [--flag-coarse-chans C,...]
  *   [--flag-fine-chans F,...] [--no-flag-dc] [--flag-init-steps N]
  *   [--flag-end-steps N] [--quack-time SEC]
  *   [--flag-edge-width KHZ] [--flag-autos] [--no-flag-metafits]
  *   [--pfb-gains auto|jake|jake_oversampled|cotter|none]
  *   [--phase-centre RA_DEG DEC_DEG] [--pointing-centre]
  *   [--emulate-cotter] [--time-chunk STEPS] [--max-memory GIB]
  *   [--no-cable-delay]
  *   [--no-geometric-delay] [--no-digital-gains] [--van-vleck]
  *   [--no-rfi] [--aocal|--apply-di-cal FILE]
  *
  * Long-name synonyms from the reference vocabulary are accepted
  * everywhere (`--passband-gains`, `--avg-time-factor`,
  * `--avg-freq-factor`, `--no-sel-autos`, ...), as is clap's
  * `--opt=value` spelling.
  * }}}
  *
  * Every option is a lazy DataFrame composition over [[graft.api.Graft]];
  * nothing executes until the sink.
  */
object Cli {

  final case class Config(
      dataDir: String = "",
      gpuboxDir: Option[String] = None,
      metafits: Option[String] = None,
      uvfitsOut: Option[String] = None,
      msOut: Option[String] = None,
      mwafOut: Option[String] = None,
      rfiStrategyFile: Option[String] = None,
      aocalFile: Option[String] = None,
      selTime: Option[(Long, Long)] = None,
      selAnts: Seq[Long] = Nil,
      selChanRanges: Option[String] = None,
      noAutos: Boolean = false,
      noFlaggedAnts: Boolean = false,
      avgTime: Int = 2,
      avgFreq: Int = 2,
      avgTimeResS: Option[Double] = None,
      avgFreqResKhz: Option[Double] = None,
      edgeChans: Option[Int] = None,
      flagTimes: Seq[Long] = Nil,
      flagAnts: Seq[Long] = Nil,
      flagCoarseChans: Seq[Long] = Nil,
      flagFineChans: Seq[Long] = Nil,
      noFlagDc: Boolean = false,
      flagInitSteps: Option[Int] = None,
      flagEndSteps: Option[Int] = None,
      flagInitS: Option[Double] = None,
      flagEndS: Option[Double] = None,
      forceDcFlag: Boolean = false,
      quackTime: Option[Double] = None,
      pfbGains: Option[String] = None,
      phaseCentreDeg: Option[(Double, Double)] = None,
      pointingCentre: Boolean = false,
      emulateCotter: Boolean = false,
      flagEdgeWidthKhz: Option[Double] = None,
      flagAutos: Boolean = false,
      noFlagMetafits: Boolean = false,
      timeChunk: Option[Int] = None,
      maxMemoryGib: Option[Double] = None,
      mwafTemplate: String = "flags_%%.mwaf",
      fitsFiles: Seq[String] = Nil,
      dryRun: Boolean = false,
      noCable: Boolean = false,
      noGeom: Boolean = false,
      noDigital: Boolean = false,
      vanVleck: Boolean = false,
      // the reference runs RFI flagging by DEFAULT and offers
      // --no-rfi to disable (cli.rs:810, applied :1455)
      rfi: Boolean = true)

  /** Parse reference-style arguments; Left(message) on any malformed
    * or unknown token (the CLI must fail loudly, as clap does).
    */
  def parse(args: Seq[String]): Either[String, Config] = {
    // clap accepts both `--opt value` and `--opt=value`; normalise the
    // latter before matching
    val norm = args.flatMap {
      case a if a.startsWith("--") && a.contains('=') =>
        val i = a.indexOf('=')
        Seq(a.substring(0, i), a.substring(i + 1))
      case a => Seq(a)
    }
    // reference long-name and short-name synonyms for options this CLI
    // spells differently (the canonical clap vocabulary, cli.rs:636-812)
    val aliases = Map(
      "--metafits" -> "-m", "--uvfits-out" -> "-u", "--ms-out" -> "-M",
      "--passband-gains" -> "--pfb-gains", "--apply-di-cal" -> "--aocal",
      "--avg-time-factor" -> "--avg-time",
      "--avg-freq-factor" -> "--avg-freq",
      "--aoflagger-strategy" -> "--flag-strategy",
      "--no-sel-autos" -> "--no-autos", "-f" -> "--flag-template")
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Either[String, Config] =
      rest match {
        case Nil =>
          // positional gpubox FITS paths (the reference's primary input
          // form, `arg!(fits_paths: <PATHS>...)`): all must share one
          // directory — the container is that directory
          val posDir: Either[String, Option[String]] =
            if (c.fitsFiles.isEmpty) Right(None)
            else {
              val parents = c.fitsFiles
                .map(f => Option(new java.io.File(f).getParent)
                  .getOrElse("."))
                .distinct
              if (parents.length == 1) Right(Some(parents.head))
              else Left(s"positional gpubox files span directories " +
                s"${parents.mkString(", ")} — one container per run")
            }
          posDir match {
            case Left(e) => Left(e)
            case Right(pd) =>
              val c2 = (pd, c.gpuboxDir) match {
                case (Some(d), None) => c.copy(gpuboxDir = Some(d))
                case _ => c
              }
              // clap-style conflict checks (reference cli.rs:748-749,
              // 681, 695, 726)
              if (c2.dataDir.isEmpty && c2.gpuboxDir.isEmpty)
                Left("missing input: -d <dataDir>, --gpubox <dir>, " +
                  "or positional gpubox FITS paths")
              else if (c2.pointingCentre && c2.phaseCentreDeg.isDefined)
                Left("--pointing-centre conflicts with --phase-centre")
              else if (c2.timeChunk.isDefined &&
                  c2.maxMemoryGib.isDefined)
                Left("--time-chunk conflicts with --max-memory")
              else if (c2.flagEdgeWidthKhz.isDefined &&
                  c2.edgeChans.isDefined)
                Left("--flag-edge-width conflicts with " +
                  "--flag-edge-chans")
              else if (c2.flagInitS.isDefined &&
                  c2.flagInitSteps.isDefined)
                Left("--flag-init conflicts with --flag-init-steps")
              else if (c2.flagEndS.isDefined &&
                  c2.flagEndSteps.isDefined)
                Left("--flag-end conflicts with --flag-end-steps")
              else if (c2.forceDcFlag && c2.noFlagDc)
                Left("--flag-dc conflicts with --no-flag-dc")
              else Right(c2)
          }
        case "-d" :: v :: t => loop(t, c.copy(dataDir = v))
        case "--gpubox" :: v :: t => loop(t, c.copy(gpuboxDir = Some(v)))
        case "-m" :: v :: t => loop(t, c.copy(metafits = Some(v)))
        case "-u" :: v :: t => loop(t, c.copy(uvfitsOut = Some(v)))
        case "-M" :: v :: t => loop(t, c.copy(msOut = Some(v)))
        case "--flag-out" :: v :: t => loop(t, c.copy(mwafOut = Some(v)))
        // reference -f/--flag-template: a PATH whose basename contains
        // %% (coarse-channel id) — split into output dir + file template
        case "--flag-template" :: v :: t =>
          val file = new java.io.File(v)
          val tmpl = file.getName
          if (!tmpl.contains("%%"))
            Left(s"--flag-template needs %% in the file name, got '$v'")
          else loop(t, c.copy(
            mwafOut = Some(Option(file.getParent).getOrElse(".")),
            mwafTemplate = tmpl))
        case "--flag-strategy" :: v :: t =>
          loop(t, c.copy(rfiStrategyFile = Some(v)))
        case "--aocal" :: v :: t => loop(t, c.copy(aocalFile = Some(v)))
        case "--sel-time" :: a :: b :: t =>
          (a.toLongOption, b.toLongOption) match {
            case (Some(x), Some(y)) if x <= y =>
              loop(t, c.copy(selTime = Some((x, y))))
            case _ => Left(s"--sel-time needs FROM <= TO, got '$a $b'")
          }
        case "--sel-ants" :: v :: t =>
          val ants = v.split(",").toSeq.map(_.trim.toLongOption)
          if (ants.exists(_.isEmpty))
            Left(s"--sel-ants needs comma-separated integers, got '$v'")
          else loop(t, c.copy(selAnts = ants.flatten))
        case "--no-autos" :: t => loop(t, c.copy(noAutos = true))
        case "--no-sel-flagged-ants" :: t =>
          loop(t, c.copy(noFlaggedAnts = true))
        case "--sel-chan-ranges" :: v :: t =>
          loop(t, c.copy(selChanRanges = Some(v)))
        case "--avg-time" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 1 => loop(t, c.copy(avgTime = n))
          case _ => Left(s"--avg-time needs a positive integer, got '$v'")
        }
        case "--avg-freq" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 1 => loop(t, c.copy(avgFreq = n))
          case _ => Left(s"--avg-freq needs a positive integer, got '$v'")
        }
        case "--flag-edge-chans" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 0 => loop(t, c.copy(edgeChans = Some(n)))
          case _ =>
            Left(s"--flag-edge-chans needs a non-negative int, got '$v'")
        }
        case "--avg-time-res" :: v :: t => v.toDoubleOption match {
          case Some(r) if r > 0 => loop(t, c.copy(avgTimeResS = Some(r)))
          case _ => Left(s"--avg-time-res needs positive seconds, got '$v'")
        }
        case "--avg-freq-res" :: v :: t => v.toDoubleOption match {
          case Some(r) if r > 0 =>
            loop(t, c.copy(avgFreqResKhz = Some(r)))
          case _ => Left(s"--avg-freq-res needs positive kHz, got '$v'")
        }
        case "--flag-coarse-chans" :: v :: t =>
          val cs = v.split(",").toSeq.map(_.trim.toLongOption)
          if (cs.exists(_.isEmpty))
            Left(s"--flag-coarse-chans needs integers, got '$v'")
          else loop(t, c.copy(flagCoarseChans = cs.flatten))
        case "--flag-fine-chans" :: v :: t =>
          val fs = v.split(",").toSeq.map(_.trim.toLongOption)
          if (fs.exists(_.isEmpty))
            Left(s"--flag-fine-chans needs integers, got '$v'")
          else loop(t, c.copy(flagFineChans = fs.flatten))
        case "--no-flag-dc" :: t => loop(t, c.copy(noFlagDc = true))
        case "--flag-init-steps" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 0 =>
            loop(t, c.copy(flagInitSteps = Some(n)))
          case _ => Left(s"--flag-init-steps needs an int, got '$v'")
        }
        case "--flag-end-steps" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 0 =>
            loop(t, c.copy(flagEndSteps = Some(n)))
          case _ => Left(s"--flag-end-steps needs an int, got '$v'")
        }
        // seconds variants (reference cli.rs:688, 696) — validated
        // against the container's timestep length at run time
        case "--flag-init" :: v :: t => v.toDoubleOption match {
          case Some(s) if s >= 0 => loop(t, c.copy(flagInitS = Some(s)))
          case _ =>
            Left(s"--flag-init needs non-negative seconds, got '$v'")
        }
        case "--flag-end" :: v :: t => v.toDoubleOption match {
          case Some(s) if s >= 0 => loop(t, c.copy(flagEndS = Some(s)))
          case _ =>
            Left(s"--flag-end needs non-negative seconds, got '$v'")
        }
        case "--flag-dc" :: t => loop(t, c.copy(forceDcFlag = true))
        case "--dry-run" :: t => loop(t, c.copy(dryRun = true))
        // parse-accepted, semantically inert here: Spark metrics/UI are
        // the progress surface, and range derivation already considers
        // only channels the container provides (reference cli.rs:654, 673)
        case "--no-draw-progress" :: t => loop(t, c)
        case "--provided-chan-ranges" :: t => loop(t, c)
        case "--pfb-gains" :: v :: t =>
          if (Seq("auto", "jake", "jake_oversampled", "cotter", "none")
              .contains(v))
            loop(t, c.copy(pfbGains = Some(v)))
          else Left(s"--pfb-gains needs " +
            s"auto|jake|jake_oversampled|cotter|none, got '$v'")
        case "--phase-centre" :: ra :: dec :: t =>
          (ra.toDoubleOption, dec.toDoubleOption) match {
            case (Some(r), Some(d)) =>
              loop(t, c.copy(phaseCentreDeg = Some((r, d))))
            case _ =>
              Left(s"--phase-centre needs RA DEC degrees, got '$ra $dec'")
          }
        case "--flag-times" :: v :: t =>
          val ts = v.split(",").toSeq.map(_.trim.toLongOption)
          if (ts.exists(_.isEmpty))
            Left(s"--flag-times needs comma-separated integers, got '$v'")
          else loop(t, c.copy(flagTimes = ts.flatten))
        case "--flag-antennas" :: v :: t =>
          val as = v.split(",").toSeq.map(_.trim.toLongOption)
          if (as.exists(_.isEmpty))
            Left(
              s"--flag-antennas needs comma-separated integers, got '$v'")
          else loop(t, c.copy(flagAnts = as.flatten))
        case "--quack-time" :: v :: t => v.toDoubleOption match {
          case Some(q) if q >= 0 => loop(t, c.copy(quackTime = Some(q)))
          case _ =>
            Left(s"--quack-time needs a non-negative seconds value, " +
              s"got '$v'")
        }
        case "--pointing-centre" :: t =>
          loop(t, c.copy(pointingCentre = true))
        case "--emulate-cotter" :: t =>
          loop(t, c.copy(emulateCotter = true))
        case "--flag-edge-width" :: v :: t => v.toDoubleOption match {
          case Some(k) if k >= 0 =>
            loop(t, c.copy(flagEdgeWidthKhz = Some(k)))
          case _ =>
            Left(s"--flag-edge-width needs non-negative kHz, got '$v'")
        }
        case "--flag-autos" :: t => loop(t, c.copy(flagAutos = true))
        case "--no-flag-metafits" :: t =>
          loop(t, c.copy(noFlagMetafits = true))
        case "--time-chunk" :: v :: t => v.toIntOption match {
          case Some(n) if n >= 1 => loop(t, c.copy(timeChunk = Some(n)))
          case _ => Left(s"--time-chunk needs a positive step count, " +
            s"got '$v'")
        }
        case "--max-memory" :: v :: t => v.toDoubleOption match {
          case Some(g) if g * 1024 * 1024 * 1024 >= 1.0 =>
            loop(t, c.copy(maxMemoryGib = Some(g)))
          case _ =>
            Left(s"--max-memory needs at least one byte in GiB, got '$v'")
        }
        case "--no-cable-delay" :: t => loop(t, c.copy(noCable = true))
        case "--no-geometric-delay" :: t => loop(t, c.copy(noGeom = true))
        case "--no-digital-gains" :: t => loop(t, c.copy(noDigital = true))
        case "--van-vleck" :: t => loop(t, c.copy(vanVleck = true))
        case "--rfi" :: t => loop(t, c.copy(rfi = true))
        case "--no-rfi" :: t => loop(t, c.copy(rfi = false))
        // positional gpubox FITS paths (reference
        // `arg!(fits_paths: <PATHS>...)`)
        case p :: t if !p.startsWith("-") =>
          loop(t, c.copy(fitsFiles = c.fitsFiles :+ p))
        case other :: _ => Left(s"unknown or incomplete argument '$other'")
      }
    loop(norm.map(a => aliases.getOrElse(a, a)).toList, Config())
  }

  /** Passband table selection — the reference's `--passband-gains`
    * with default `auto` (cli.rs:1401-1443): an explicit table wins;
    * auto picks by the container's correlator version, or disables
    * the stage entirely when deripple was already applied upstream.
    * Returns (decision line, None = unity passband | Some((version,
    * oversampled))).
    */
  def passbandSelect(cfg: Config, meta: MetaSource)
      : (String, Option[(graft.model.PfbTables.MwaVersion, Boolean)]) = {
    import graft.model.PfbTables._
    cfg.pfbGains.getOrElse("auto") match {
      case "none" => ("passband: skip (--pfb-gains none)", None)
      case "jake" =>
        ("passband: apply (jake 2022 — mwax)", Some((CorrMwaxV2, false)))
      case "jake_oversampled" =>
        ("passband: apply (jake 2025 — mwax, oversampled)",
          Some((CorrMwaxV2, true)))
      case "cotter" =>
        ("passband: apply (cotter 2014 — legacy)",
          Some((CorrLegacy, false)))
      case _ if meta.derippleApplied =>
        ("passband: skip (auto: deripple already applied)", None)
      case _ =>
        val v = meta.mwaVersion
        (s"passband: apply (auto: $v, oversampled=${meta.oversampled})",
          Some((v, meta.oversampled)))
    }
  }

  /** Effective J2000 phase centre (radians): explicit --phase-centre
    * wins; --pointing-centre phases to the container's tile pointing;
    * else the container's RAPHASE/DECPHASE-or-pointing (reference
    * RADec::from_mwalib_phase_or_pointing, cli.rs:1364-1377); None for
    * a container with no centre (the fixed gate ephemeris).
    */
  def effectivePhaseCentre(cfg: Config, meta: MetaSource)
      : Option[(Double, Double)] =
    cfg.phaseCentreDeg
      .orElse {
        if (cfg.pointingCentre)
          Some(meta.pointingCentreDeg.getOrElse(sys.error(
            "--pointing-centre: container carries no RA/DEC tile " +
              "pointing")))
        else meta.phaseCentreDeg
      }
      .map { case (r, d) => (r.toRadians, d.toRadians) }

  /** The stage decisions the run will take, with their reasons — the
    * reference logs exactly these before preprocessing (cli.rs:1389+).
    * Pure so the spec can assert them without running the pipeline.
    */
  def decisions(cfg: Config, meta: MetaSource): Seq[String] = Seq(
    if (cfg.emulateCotter)
      "array position: cotter emulation (--emulate-cotter)"
    else "array position: default site",
    (cfg.phaseCentreDeg, cfg.pointingCentre,
        meta.phaseCentreDeg) match {
      case (Some((r, d)), _, _) =>
        s"phase centre: explicit ($r, $d) deg (--phase-centre)"
      case (_, true, _) =>
        "phase centre: tile pointing (--pointing-centre)"
      case (_, _, Some((r, d))) =>
        s"phase centre: container ($r, $d) deg"
      case _ => "phase centre: fixed gate ephemeris"
    },
    if (cfg.noCable)
      "cable: skip (--no-cable-delay)"
    else if (meta.cableApplied)
      "cable: skip (metafits CABLEDEL: already applied upstream)"
    else "cable: apply",
    if (cfg.noGeom)
      "geometry: skip (--no-geometric-delay)"
    else if (meta.geometryApplied)
      "geometry: skip (metafits GEODEL: already applied upstream)"
    else "geometry: apply",
    if (cfg.noDigital) "digital gains: skip (--no-digital-gains)"
    else "digital gains: apply",
    passbandSelect(cfg, meta)._1,
    if (cfg.vanVleck)
      s"van vleck: apply (--van-vleck, sample scale " +
        s"${meta.vvSampleScale()} from container constants)"
    else "van vleck: skip (default: modern correlator)",
    cfg.rfiStrategyFile match {
      case Some(f) if cfg.rfi => s"rfi: apply (strategy file $f)"
      case _ =>
        if (cfg.rfi) "rfi: apply (default strategy)"
        else "rfi: skip (--no-rfi)"
    },
    cfg.aocalFile match {
      case Some(f) => s"calibrate: apply (MWAOCAL solutions $f)"
      case None => "calibrate: skip (no solutions file)"
    })

  /** Stack the requested ad-hoc overrides over the base metadata seam
    * ([[graft.model.MetaDecorators]]).
    */
  def decorate(base: MetaSource, cfg: Config): MetaSource = {
    import graft.model.MetaDecorators._
    var m = base
    // clear the container's own antenna flags FIRST, so ad-hoc
    // --flag-antennas stacked later still apply (reference
    // clear-then-add order, cli.rs:1029-1053)
    if (cfg.noFlagMetafits) m = ClearAntFlags(m)
    // EdgeFlag REDERIVES the default channel flags (DC included), so
    // the DC clear must wrap OUTSIDE it — but still inside the additive
    // layers, which may legitimately flag DC cells for their own
    // reasons (a fully-flagged coarse channel keeps its centre)
    cfg.edgeChans.foreach(e => m = EdgeFlag(m, e))
    // kHz edge width → fine-channel count against the container grid;
    // a non-multiple width fails loudly (reference cli.rs:1079-1092)
    cfg.flagEdgeWidthKhz.foreach { khz =>
      val perChanKhz = base.fineChanWidthHz / 1000.0
      val n = khz / perChanKhz
      require(math.abs(n - math.floor(n)) <= 1e-5,
        s"--flag-edge-width $khz kHz is not a multiple of the fine " +
          s"channel width ($perChanKhz kHz)")
      require(n.toInt < base.fineChansPerCoarse / 2,
        s"--flag-edge-width $khz kHz = ${n.toInt} chans >= half the " +
          s"coarse channel (${base.fineChansPerCoarse})")
      m = EdgeFlag(m, n.toInt)
    }
    if (cfg.flagAutos) m = FlagAutos(m)
    if (cfg.noFlagDc) m = NoDcFlag(m)
    if (cfg.forceDcFlag) m = DcFlag(m)
    if (cfg.flagTimes.nonEmpty) m = FlagTimes(m, cfg.flagTimes)
    if (cfg.flagAnts.nonEmpty) m = FlagAnts(m, cfg.flagAnts)
    cfg.quackTime.foreach(q => m = QuackTime(m, q))
    cfg.flagInitSteps.foreach(n => m = FlagInitSteps(m, n))
    cfg.flagEndSteps.foreach(n => m = FlagEndSteps(m, n))
    // seconds → steps against the container grid; a non-multiple fails
    // loudly exactly as the reference's check does (cli.rs:1104-1121)
    def secondsToSteps(flag: String, s: Double): Int = {
      val d = base.intTimeS
      val rem = s % d
      require(rem < 1e-6 || d - rem < 1e-6,
        s"$flag $s s is not a multiple of the timestep length ($d s)")
      math.round(s / d).toInt
    }
    cfg.flagInitS.foreach(s =>
      m = FlagInitSteps(m, secondsToSteps("--flag-init", s)))
    cfg.flagEndS.foreach(s =>
      m = FlagEndSteps(m, secondsToSteps("--flag-end", s)))
    if (cfg.flagCoarseChans.nonEmpty)
      m = FlagCoarseChans(m, cfg.flagCoarseChans)
    if (cfg.flagFineChans.nonEmpty)
      m = FlagFineChans(m, cfg.flagFineChans)
    m
  }

  /** Effective averaging factors: a resolution wins over a factor
    * (reference --avg-{time,freq}-res vs -factor, cli.rs:1171-1258),
    * quantised to the container's own grid.
    */
  def avgFactors(cfg: Config, meta: MetaSource): (Int, Int) = {
    val at = cfg.avgTimeResS
      .map(r => math.max(1, math.round(r / meta.intTimeS).toInt))
      .getOrElse(cfg.avgTime)
    val af = cfg.avgFreqResKhz
      .map(r =>
        math.max(1, math.round(r * 1000.0 / meta.fineChanWidthHz).toInt))
      .getOrElse(cfg.avgFreq)
    (at, af)
  }

  /** Run one preprocess-and-write pass; returns rows written per sink.
    * Skip decisions go to stderr exactly once, before execution.
    */
  def run(spark: SparkSession, cfg: Config,
          log: String => Unit = s => System.err.println(s)): Long = {
    val g0 = Graft(spark)
    val g = cfg.metafits.map(g0.withMetafits).getOrElse(g0)
    val meta = decorate(g.meta, cfg)

    // Van Vleck is a legacy-correlator correction; the reference CLI
    // rejects --van-vleck on anything else (cli.rs:1378-1388)
    require(!cfg.vanVleck ||
        meta.mwaVersion == graft.model.PfbTables.CorrLegacy,
      s"--van-vleck expects legacy correlator files, " +
        s"got ${meta.mwaVersion}")

    decisions(cfg, meta).foreach(d => log(s"[graft] $d"))

    // reference --dry-run (cli.rs:653): print the summary and exit
    // before touching any visibility data
    if (cfg.dryRun) {
      log(s"[graft] dry run: ${meta.nAnts} ants, " +
        s"${meta.nAnts * (meta.nAnts + 1) / 2} baselines, " +
        s"${meta.nScans} timesteps @ ${meta.intTimeS} s, " +
        s"${meta.nChans} fine chans @ ${meta.fineChanWidthHz / 1e3} " +
        s"kHz (${meta.fineChansPerCoarse}/coarse), " +
        s"correlator ${meta.mwaVersion}")
      return 0L
    }

    val (avgT, avgF) = avgFactors(cfg, meta)
    // chunking flags parse and validate as the reference's do
    // (cli.rs:1275-1320); execution-wise Spark's partition streaming
    // IS the chunking — each task holds one partition, sized by
    // spark.sql.files.maxPartitionBytes, never the whole observation —
    // so the values need no further plumbing here
    cfg.timeChunk.foreach { n =>
      require(n % avgT == 0,
        s"--time-chunk $n is not a multiple of the temporal " +
          s"averaging factor $avgT")
      log(s"[graft] time chunk: $n steps (Spark partition streaming)")
    }
    cfg.maxMemoryGib.foreach(g =>
      log(s"[graft] max memory: $g GiB (Spark partition streaming)"))
    val g2 = g.copy(meta = meta)
    // the reference's primary input: a directory of gpubox FITS files
    // (+ metafits); the parquet observation is the testdata path
    var vf = cfg.gpuboxDir match {
      case Some(gd) =>
        log(s"[graft] reading gpubox FITS from $gd (${meta.nAnts} ants)")
        g2.fitsObservation(gd, meta.nAnts).withRawDefaults()
      case None => g2.observation(cfg.dataDir)
    }
    cfg.selTime.foreach { case (a, b) => vf = vf.selectTime(a, b) }
    if (cfg.selAnts.nonEmpty) vf = vf.selectAnts(cfg.selAnts)
    cfg.selChanRanges.foreach(spec => vf = vf.selectChannelRanges(spec))
    if (cfg.noFlaggedAnts) vf = vf.withoutFlaggedAnts()
    if (cfg.noAutos) vf = vf.withoutAutos()
    vf = vf.withDefaultFlags().withWeights(meta.weightFactor)

    // a .lua file is an AOFlagger strategy (the file a Birli user
    // already owns) — translate its parameter surface and REPORT the
    // dropped behaviors; anything else is the native key=value format
    val translation = cfg.rfiStrategyFile
      .filter(_.toLowerCase.endsWith(".lua"))
      .map { f =>
        val tr = graft.ops.LuaStrategy.fromFile(f,
          spark.sparkContext.hadoopConfiguration)
        tr.unmapped.foreach(u =>
          log(s"[graft] rfi: lua strategy call NOT translated: $u"))
        tr.approximated.foreach(a =>
          log(s"[graft] rfi: lua strategy call APPROXIMATED: $a"))
        tr
      }
    val strategy = translation.map(_.strategy)
      .orElse(cfg.rfiStrategyFile.map(f =>
        graft.ops.RfiStrategy.fromFile(f,
          spark.sparkContext.hadoopConfiguration)))
      .getOrElse(graft.ops.RfiStrategy())
    val pbSel = passbandSelect(cfg, meta)._2
    // a strategy's apply_bandpass file affects DETECTION ONLY: the
    // reference runs the strategy on an ImageSet copy (flags.rs
    // RunExisting) and only the flag mask propagates back, so the
    // gains divide the amplitude grid fed to RfiFlag and never the
    // output visibilities or weights. Loaded only when the RFI stage
    // actually runs — a strategy the run never executes must not be
    // read at all. PassbandGains.external still REFUSES when a
    // built-in PFB table is also selected (the passband stage runs
    // before RFI, so the detection grid would be double-corrected).
    val bandpassFiles = translation.map(_.bandpassFiles).getOrElse(Nil)
    require(bandpassFiles.size <= 1,
      s"strategy applies ${bandpassFiles.size} bandpass files — at " +
        "most one is supported")
    if (!cfg.rfi && bandpassFiles.nonEmpty)
      log("[graft] rfi: strategy bandpass ignored (--no-rfi — the " +
        "strategy never runs)")
    val rfiBandpass = bandpassFiles.headOption.filter(_ => cfg.rfi)
      .map { f =>
        log(s"[graft] rfi: strategy bandpass '$f' applied to the " +
          "detection grid only (output data/weights untouched)")
        graft.ops.PassbandGains.external(spark, f,
          meta.fineChansPerCoarse, pipelineAppliesPfb = pbSel.isDefined)
      }
    val pre = Preprocess(
      vanVleck = cfg.vanVleck,
      sampleScale = meta.vvSampleScale(),
      cable = !cfg.noCable,
      digitalGains = !cfg.noDigital,
      passband = pbSel.isDefined,
      geometry = !cfg.noGeom,
      rfi = cfg.rfi,
      pfbVersion = pbSel.map(_._1),
      pfbOversampled = pbSel.exists(_._2),
      rfiBandpass = rfiBandpass,
      // DI calibration ONLY when a solutions file is given — the
      // reference applies it only under --apply-di-cal (cli.rs:1637);
      // a default run must never multiply by synthetic solutions
      calibrate = cfg.aocalFile.isDefined,
      meta = meta,
      rfiStrategy = strategy,
      aocalPath = cfg.aocalFile,
      phaseCentre = effectivePhaseCentre(cfg, meta),
      arrayPos =
        if (cfg.emulateCotter)
          Some((graft.ops.GeometryCorrection.CotterLonRad,
            graft.ops.GeometryCorrection.CotterLatRad))
        else None)
    val processed = vf.preprocess(pre)
    // group parameters must track the SAME phase centre the geometry
    // stage used — a default-centre table would be inconsistent with
    // the rotated DATA
    lazy val uvwT = pre.uvwTable(spark)
    val phaseRad = effectivePhaseCentre(cfg, meta)

    // mwaf flags are written AFTER preprocessing, so RFI detections
    // (and calibration NaN flags) reach the flag files — the primary
    // purpose of the mwaf output in the reference
    val mwafRows = cfg.mwafOut.map { dir =>
      log(s"[graft] writing mwaf flags to $dir")
      val counts = processed.writeMwaf(dir, cfg.mwafTemplate)
      log(s"[graft] wrote ${counts.values.sum} mwaf rows over " +
        s"${counts.size} coarse channels")
      counts.values.sum
    }
    val msRows = cfg.msOut.map { dir =>
      log(s"[graft] writing MS container to $dir")
      val n = processed.writeMs(dir, avgT, avgF, uvw = Some(uvwT),
        phaseDir = phaseRad)
      log(s"[graft] wrote $n MS rows")
      n
    }
    val uvRows = cfg.uvfitsOut.map { path =>
      log(s"[graft] writing uvfits to $path")
      val n = processed.writeUvfits(path, avgT, avgF, uvw = Some(uvwT))
      log(s"[graft] wrote $n uvfits groups")
      n
    }
    uvRows.orElse(msRows).orElse(mwafRows).getOrElse {
      // NO sink requested: count is the dry-run action; when any sink
      // ran, its own count is the result (no second execution)
      processed.df.count()
    }
  }

  def main(args: Array[String]): Unit =
    parse(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(s"[graft] argument error: $err")
        sys.exit(2)
      case Right(cfg) =>
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
          .config("spark.sql.shuffle.partitions", cpus)
      // safety net: a fused stage whose single whole-stage method would
      // exceed HotSpot's 8000-byte JIT ceiling falls back to per-operator
      // codegen (still JIT-compiled) instead of running one giant
      // un-JIT-able method (~7x). The correction chains themselves now
      // stay under the ceiling (CableCorrection's two-stage projection).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
          .config("spark.ui.enabled", "false")
          .appName("graft")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try {
          val n = run(spark, cfg)
          System.err.println(s"[graft] done ($n rows)")
        } finally spark.stop()
    }
}
