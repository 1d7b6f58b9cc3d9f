package graft.ops

/** Migration path for AOFlagger Lua strategy files.
  *
  * The reference flags RFI by handing each baseline to AOFlagger with a
  * loadable Lua strategy (`/root/reference/src/flags.rs:406-412`,
  * `LoadStrategyFile`; the default comes from `FindStrategyFileMWA`,
  * flags.rs:354-360). An observatory user migrating to this engine owns
  * a tuned `.lua` file; this translator extracts the parameter surface
  * that [[RfiStrategy]] models from it, so that file keeps working
  * without hand re-expression.
  *
  * This is a PARAMETER translator, not a Lua interpreter: it resolves
  * numeric `local` bindings and recognises the calls whose knobs map
  * onto the engine's strategy model (translation table in README
  * "AOFlagger Lua strategy migration"):
  *
  *  - `local base_threshold = x` → `mad_k = 6.0 · x` (AOFlagger's
  *    relative sensitivity multiplier over its default ≙ the engine's
  *    default MAD multiplier 6.0)
  *  - `aoflagger.sumthreshold(data, lt, lf, …)` → `time_weight = 1/lt`,
  *    `chan_weight = 1/lf` (AOFlagger levels RAISE the threshold;
  *    engine weights DIVIDE it — reciprocal by construction)
  *  - `aoflagger.scale_invariant_rank_operator(data, ηh, ηv)` →
  *    `sir_eta_time = ηh`, `sir_eta_chan = ηv` (AOFlagger images are
  *    x = time, y = frequency)
  *  - `aoflagger.high_pass_filter(data, kx, ky, σx, σy)` →
  *    `bg_kind = gaussian`, `bg_window_time = kx/2`,
  *    `bg_window_chan = ky/2`, `bg_sigma_time = σx`,
  *    `bg_sigma_chan = σy` — the engine's masked normalized Gaussian
  *    convolution IS AOFlagger's high-pass kernel (q_r1d-gated);
  *    sigmas absent from the call fall to the documented w/2 default
  *  - `aoflagger.sumthreshold_masked(d, orig, lt, lf, …)` → like
  *    `sumthreshold` with the levels at args 3/4 (the engine's
  *    SumThreshold already sums unflagged samples only, which is what
  *    the mask argument exists for)
  *  - `aoflagger.low_pass_filter(data, kx, ky, σx, σy)` → the same
  *    Gaussian background knobs as `high_pass_filter`: published
  *    strategies follow the low-pass with `original − smoothed`,
  *    which is exactly the residual the engine's background-subtract
  *    detect loop computes
  *  - `aoflagger.downsample(d, fx, fy, …)` →
  *    `aoflagger.low_pass_filter(…)` → `aoflagger.upsample(…, fx,
  *    fy)` BRACKETS → the bracketed low-pass with kernel and sigmas
  *    scaled to full resolution (×fx, ×fy): the decimation is
  *    AOFlagger's own speed trick for the same smoothing, and the
  *    engine computes the full-resolution convolution directly. A
  *    downsample/upsample outside this pattern is reported unmapped.
  *  - `local iteration_count = n` → `iterations`,
  *    `local threshold_factor_step = x` → `ramp_factor` (the
  *    detect-loop ramp published strategies drive their Lua `for`
  *    loop with)
  *  - `aoflagger.threshold_timestep_rms(data, k)` →
  *    `ts_rms_threshold = k` and
  *    `aoflagger.threshold_channel_rms(data, k, low)` →
  *    `ch_rms_threshold = k`, `ch_rms_flag_low = low` — the engine's
  *    whole-line RMS flaggers (q_r1e-gated), run where the published
  *    strategy calls them (timestep pass per pol after the detect
  *    loop, channel pass after SIR). A `threshold_timestep_rms`
  *    whose target IS the `execute(input)` parameter — the published
  *    MWA default's final `aoflagger.threshold_timestep_rms(input,
  *    4.0)` on the whole set after the pol loop — maps to
  *    `ts_rms_final = k`, the engine's combined-grid pass after the
  *    channel cleanup. An RMS threshold given as `<x> * <ramp>`
  *    (the published `3.0 * threshold_factor`) resolves with the
  *    ramp variable at its FINAL-iteration value 1: the engine runs
  *    its cleanup passes at the final-cleanup position, where the
  *    published ramp `threshold_factor_step^(iteration_count − i)`
  *    has decayed to 1. A second call re-targeting an already-set
  *    slot with a DIFFERENT threshold displaces the earlier one —
  *    the displaced call is reported in `unmapped`, never silently
  *    dropped.
  *  - `aoflagger.apply_bandpass(data, file)` → the FILE is surfaced in
  *    [[LuaStrategy.Translation.bandpassFiles]] for the caller to
  *    route through the passband stage
  *    ([[graft.ops.PassbandGains.external]]) — which REFUSES when the
  *    pipeline already applies PFB gains, so the strategy's bandpass
  *    cannot silently double-apply
  *  - `aoflagger.Polarization.XX|XY|YX|YY` mentions → `pols`
  *
  * Everything else a strategy can do (visualisation, custom Lua
  * logic) is NOT modeled; those calls are returned verbatim in
  * [[LuaStrategy.Translation.unmapped]] so the migration is honest —
  * the caller sees exactly which behaviors the translated strategy
  * drops, instead of a silent approximation. RMS cleanup passes called
  * INSIDE the detect loop are MODELED, not approximated: the translator
  * sets `RfiStrategy.tsRmsInLoop`/`chRmsInLoop` and the kernel runs the
  * pass after every iteration's detection, so its flags feed the next
  * iteration's background statistics exactly as in AOFlagger (gated by
  * q_r1f). The two positions the engine still cannot honour — a
  * channel pass out of the loop but before SIR, and the whole-set
  * final timestep pass called inside the per-pol loop (the combined
  * grid does not exist there) — are reported in
  * [[LuaStrategy.Translation.approximated]]: translated to the closest
  * fixed position, with the repositioning named.
  *
  * Honesty contract: EVERY occurrence of the token `aoflagger.` in the
  * (comment-stripped) file is accounted for — parsed into a mapped
  * call, recognised as scaffolding or a Polarization constant, or
  * reported in `unmapped`. The call scanner brace-matches argument
  * lists, so nested parentheses and multi-line calls cannot vanish
  * silently (a `aoflagger.` mention the scanner cannot parse as a call
  * is itself reported).
  */
object LuaStrategy {

  /** The translated strategy, the external bandpass files the strategy
    * applies (each `aoflagger.apply_bandpass(data, "file")` call, in
    * order — route them into the DETECTION grid via
    * `Preprocess.rfiBandpass`: the reference runs strategies on an
    * ImageSet copy so only flags propagate back), every `aoflagger.*`
    * call the engine could not map, and every call that MAPPED but
    * whose call-site POSITION the engine approximates. In-loop RMS
    * call sites are modeled (tsRmsInLoop/chRmsInLoop — the pass runs
    * inside every detect iteration); what remains approximated is a
    * channel pass out of the loop but before SIR, and a whole-set
    * final timestep pass called inside the per-pol loop.
    * Full-fidelity migration means `unmapped` AND `approximated` are
    * BOTH empty; `approximated` entries still translate to the closest
    * engine placement, they are fidelity caveats, not drops.
    */
  case class Translation(strategy: RfiStrategy, unmapped: Seq[String],
                         bandpassFiles: Seq[String] = Nil,
                         approximated: Seq[String] = Nil)

  private val LocalNum =
    """local\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(-?[0-9.eE+-]+)\s*""".r
  private val Ident = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val RampVar =
    ("""local\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*""" +
      """math\.pow\(\s*threshold_factor_step""").r
  private val ExecuteParam =
    """function\s+execute\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)""".r

  /** Calls that are part of every published strategy's scaffolding and
    * carry no detection knobs the engine lacks — not worth reporting.
    */
  private val Scaffolding = Set("set_progress", "set_flag_function",
    "copy_to_channel", "copy_from_channel", "norm",
    "print_polarization_statistics",
    // version pins carry no detection knob
    "require_min_version", "require_max_version")

  /** One scanned `aoflagger.` site: function name (None when the
    * mention is not a parsable call), top-level-comma-split args, the
    * verbatim source snippet, and the character offset of the mention
    * (for position-sensitive fidelity notes — e.g. a cleanup pass
    * called inside the detect loop).
    */
  private case class Site(fn: Option[String], args: Seq[String],
                          snippet: String, pos: Int = 0)

  /** Character spans of Lua `for`/`while`/`repeat` loop BODIES —
    * keyword-stack scan over the comment-stripped text (function/if/do
    * blocks tracked so their `end`s pop correctly). A heuristic, not a
    * Lua parser: a keyword inside a string literal could misalign the
    * stack, but the only consumer is an ADVISORY fidelity note, never
    * the translated strategy values.
    */
  private[graft] def loopSpans(text: String): Seq[(Int, Int)] = {
    val kw = """\b(function|if|for|while|repeat|do|end|until)\b""".r
    // frame kinds: 'F' function, 'I' if, 'H' loop header awaiting its
    // `do`, 'L' loop body, 'D' plain do-block, 'R' repeat body
    val stack = scala.collection.mutable.Stack[(Char, Int)]()
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    kw.findAllMatchIn(text).foreach { m =>
      m.group(1) match {
        case "function" => stack.push(('F', m.start))
        case "if" => stack.push(('I', m.start))
        case "for" | "while" => stack.push(('H', m.start))
        case "repeat" => stack.push(('R', m.end))
        case "do" =>
          if (stack.nonEmpty && stack.top._1 == 'H') {
            val (_, start) = stack.pop()
            stack.push(('L', start))
          } else stack.push(('D', m.start))
        case "end" if stack.nonEmpty =>
          val (kind, start) = stack.pop()
          if (kind == 'L') spans += ((start, m.start))
        case "until" if stack.nonEmpty && stack.top._1 == 'R' =>
          val (_, start) = stack.pop()
          spans += ((start, m.start))
        case _ => ()
      }
    }
    spans.toSeq
  }

  /** Scan every `aoflagger.` mention with brace-matched argument
    * lists — works across newlines and through nested parentheses.
    */
  private def scan(text: String): Seq[Site] = {
    val sites = scala.collection.mutable.ArrayBuffer[Site]()
    var from = text.indexOf("aoflagger.")
    while (from >= 0) {
      val after = from + "aoflagger.".length
      val ident = Ident.findPrefixOf(text.substring(after)).getOrElse("")
      val idEnd = after + ident.length
      val parenAt = {
        var k = idEnd
        while (k < text.length && text(k).isWhitespace) k += 1
        if (k < text.length && text(k) == '(') Some(k) else None
      }
      val site = (ident, parenAt) match {
        case ("Polarization", _) =>
          // constant mention (aoflagger.Polarization.XX), not a call
          val stop = math.min(text.length, idEnd + 3)
          Site(Some("Polarization"), Nil, text.substring(from, stop),
            from)
        case (fn, Some(open)) if fn.nonEmpty =>
          // brace-match the argument list, splitting at depth-1 commas
          var depth = 0
          var k = open
          var argStart = open + 1
          val args = scala.collection.mutable.ArrayBuffer[String]()
          var close = -1
          while (k < text.length && close < 0) {
            text(k) match {
              case '(' => depth += 1
              case ')' =>
                depth -= 1
                if (depth == 0) {
                  if (k > argStart || args.nonEmpty)
                    args += text.substring(argStart, k)
                  close = k
                }
              case ',' if depth == 1 =>
                args += text.substring(argStart, k)
                argStart = k + 1
              case _ => ()
            }
            k += 1
          }
          if (close < 0) // unterminated call — report, don't drop
            Site(None, Nil, text.substring(from,
              math.min(text.length, from + 80)), from)
          else Site(Some(fn), args.toSeq.map(_.trim),
            text.substring(from, close + 1), from)
        case _ =>
          // bare `aoflagger.` or field access with no call — report
          Site(None, Nil, text.substring(from,
            math.min(text.length, idEnd.max(from + 20))), from)
      }
      sites += site
      from = text.indexOf("aoflagger.", from + site.snippet.length.max(1))
    }
    sites.toSeq
  }

  def translate(lua: String): Translation = {
    // strip Lua comments (line `--` and block `--[[ ]]--` the cheap way)
    val noBlock = lua.replaceAll("(?s)--\\[\\[.*?\\]\\]", "")
    val lines = noBlock.linesIterator
      .map(l => l.indexOf("--") match {
        case -1 => l
        case i  => l.substring(0, i)
      })
      .toSeq
    val text = lines.mkString("\n")

    val envConst: Map[String, Double] = LocalNum.findAllMatchIn(text)
      .flatMap { m =>
        try Some(m.group(1) -> m.group(2).toDouble)
        catch { case _: Exception => None }
      }.toMap
    // the published detect-loop ramp variable (`local threshold_factor
    // = math.pow(threshold_factor_step, iteration_count - i)`): the
    // engine's RMS cleanup passes run at the final-cleanup position,
    // where the ramp has decayed to step^0 = 1 — bind the variable to
    // that value so ramped thresholds resolve at their final-iteration
    // strength. Only bound when the file defines the step the engine
    // models (otherwise the name stays unresolvable → reported).
    val ramp: Map[String, Double] =
      if (envConst.contains("threshold_factor_step"))
        RampVar.findAllMatchIn(text).map(_.group(1) -> 1.0).toMap
      else Map.empty
    val env = envConst ++ ramp

    def resolve(arg: String): Option[Double] = {
      val a = arg.trim
      (try Some(a.toDouble)
      catch { case _: Exception => env.get(a) }).orElse {
        // one top-level product (`3.0 * threshold_factor`) — both
        // factors must themselves resolve
        val k = a.indexOf('*')
        if (k > 0 && a.indexOf('(') < 0 && a.indexOf('*', k + 1) < 0)
          for {
            l <- resolve(a.substring(0, k))
            r <- resolve(a.substring(k + 1))
          } yield l * r
        else None
      }
    }

    // `function execute(input)`'s parameter name: a call targeting it
    // operates on the WHOLE input set (the published final cleanup),
    // not a per-pol image
    val inputName = ExecuteParam.findFirstMatchIn(text).map(_.group(1))

    val sites = scan(text)
    val pols = sites.collect {
      case Site(Some("Polarization"), _, snip, _) =>
        snip.split('.').last.toLowerCase
    }.filter(RfiStrategy.PolComps.contains).distinct

    var s = RfiStrategy(
      pols = if (pols.nonEmpty) pols else Seq("xx"),
      // absent calls leave AOFlagger features off, not at engine
      // defaults: a Lua file that never invokes SIR runs without it
      sirEtaTime = 0.0, sirEtaChan = 0.0)
    env.get("base_threshold").foreach(bt => s = s.copy(madK = 6.0 * bt))
    env.get("iteration_count").foreach(n =>
      s = s.copy(iterations = n.toInt.max(1)))
    env.get("threshold_factor_step").foreach(x =>
      s = s.copy(rampFactor = x))

    val unmapped = scala.collection.mutable.ArrayBuffer[String]()
    val bandpass = scala.collection.mutable.ArrayBuffer[String]()
    // last snippet mapped into each RMS slot — the call a later
    // re-targeting displaces (and must report); the slot's loop
    // placement lives in s.tsRmsInLoop / s.chRmsInLoop (the strategy
    // field the displacement check reads), so the slot holds the
    // snippet text only
    var tsSnip: Option[String] = None
    var tsFinalSnip: Option[String] = None
    var chSnip: Option[String] = None
    // downsample → low_pass_filter → upsample bracketing: published
    // strategies compute their high-pass background on a decimated
    // image for speed (aoflagger's own high_pass_filter does the same
    // resize internally), so the triple is semantically ONE Gaussian
    // low-pass whose kernel/sigma in full-resolution units are the
    // call's values × the decimation factors. The bracket is tracked
    // positionally; a downsample never consumed by a following
    // low_pass+upsample (or an upsample with mismatched factors) is
    // reported, not silently dropped.
    // pendingScale: an open downsample bracket (fx, fy, its snippet);
    // pendingLp: a low-pass seen INSIDE that bracket, held back until
    // the bracket closes with a matching upsample — applying it
    // eagerly and then reporting the bracket unmapped would both bake
    // in the decimation factors AND claim they were dropped
    var pendingScale: Option[(Double, Double, String)] = None
    var pendingLp
        : Option[(Double, Double, Option[Double], Option[Double], String)] =
      None
    def hpf(kx: Double, ky: Double, sx: Option[Double],
            sy: Option[Double], fx: Double, fy: Double): Unit =
      s = s.copy(bgKind = "gaussian",
        bgWindowTime = ((kx * fx).toInt / 2).max(1),
        bgWindowChan = ((ky * fy).toInt / 2).max(1),
        bgSigmaTime = sx.map(_ * fx).getOrElse(0.0),
        bgSigmaChan = sy.map(_ * fy).getOrElse(0.0))
    def spillBracket(): Unit = {
      // an unclosed/mismatched bracket is reported WHOLE: the
      // downsample AND the low-pass it swallowed
      pendingScale.foreach(p => unmapped += p._3)
      pendingLp.foreach(lp => unmapped += lp._5)
      pendingScale = None
      pendingLp = None
    }
    // loop-body spans + the first SIR call site: an in-loop RMS call
    // site is MODELED (tsRmsInLoop/chRmsInLoop — the kernel runs the
    // pass inside every detect iteration); an out-of-loop pre-SIR
    // channel pass and an in-loop whole-set final pass remain
    // positional approximations the user must be told about
    val spans = loopSpans(text)
    def inLoop(p: Int): Boolean =
      spans.exists { case (a, b) => p >= a && p < b }
    val sirPos = sites.collectFirst {
      case Site(Some("scale_invariant_rank_operator"), _, _, p) => p
    }
    val approximated = scala.collection.mutable.ArrayBuffer[String]()
    sites.foreach {
      case Site(Some("Polarization"), _, _, _) => ()
      case Site(Some(fn), args, snippet, pos) => fn match {
        case "sumthreshold" if args.length >= 3 =>
          for (lt <- resolve(args(1))) s = s.copy(timeWeight = 1.0 / lt)
          for (lf <- resolve(args(2))) s = s.copy(chanWeight = 1.0 / lf)
        case "sumthreshold_masked" if args.length >= 4 =>
          // (data, missingMask, xLevel, yLevel, xDir, yDir) — the
          // masked variant published strategies call so pre-existing
          // flags don't bias the threshold sums; the engine's
          // SumThreshold already operates on unflagged samples only,
          // so the knobs map like sumthreshold with args shifted 1
          for (lt <- resolve(args(2))) s = s.copy(timeWeight = 1.0 / lt)
          for (lf <- resolve(args(3))) s = s.copy(chanWeight = 1.0 / lf)
        case "scale_invariant_rank_operator" if args.length >= 3 =>
          for (h <- resolve(args(1))) s = s.copy(sirEtaTime = h)
          for (v <- resolve(args(2))) s = s.copy(sirEtaChan = v)
        case "high_pass_filter" if args.length >= 3 =>
          // AOFlagger signature: (data, kernelWidth, kernelHeight,
          // horizontalSigma, verticalSigma) with x = time,
          // y = frequency — maps DIRECTLY onto the engine's Gaussian
          // masked-convolution background (bg_kind = gaussian), kernel
          // sizes as half-windows, sigmas passed through when present
          // (absent → the documented w/2 default)
          (resolve(args(1)), resolve(args(2))) match {
            case (Some(kx), Some(ky)) =>
              hpf(kx, ky, args.lift(3).flatMap(resolve),
                args.lift(4).flatMap(resolve), 1.0, 1.0)
            case _ => unmapped += snippet
          }
        case "low_pass_filter" if args.length >= 3 =>
          // same kernel as high_pass_filter — published strategies
          // follow the low-pass with `original - smoothed`, which is
          // exactly the residual the engine's background-subtract
          // detect loop computes; inside a downsample/upsample
          // bracket the call is HELD until the bracket closes (the
          // kernel and sigmas then scale to full resolution)
          (resolve(args(1)), resolve(args(2))) match {
            case (Some(kx), Some(ky)) =>
              val sx = args.lift(3).flatMap(resolve)
              val sy = args.lift(4).flatMap(resolve)
              if (pendingScale.isDefined) {
                // a SECOND low-pass inside the same bracket displaces
                // the held one — account for the displaced call
                // instead of silently dropping it (every aoflagger.
                // site is mapped or reported, no third state)
                pendingLp.foreach(lp => unmapped += lp._5)
                pendingLp = Some((kx, ky, sx, sy, snippet))
              } else hpf(kx, ky, sx, sy, 1.0, 1.0)
            case _ => unmapped += snippet
          }
        case "downsample" if args.length >= 3 =>
          (resolve(args(1)), resolve(args(2))) match {
            case (Some(fx), Some(fy)) =>
              spillBracket() // an earlier bracket never closed
              pendingScale = Some((fx, fy, snippet))
            case _ => unmapped += snippet
          }
        case "upsample" if args.length >= 4 =>
          (resolve(args(2)), resolve(args(3)),
            pendingScale, pendingLp) match {
            case (Some(fx), Some(fy), Some((px, py, _)),
                Some((kx, ky, sx, sy, _)))
                if fx == px && fy == py =>
              // bracket closed with matching factors: the held
              // low-pass applies at full resolution
              hpf(kx, ky, sx, sy, fx, fy)
              pendingScale = None
              pendingLp = None
            case _ =>
              spillBracket()
              unmapped += snippet
          }
        case "threshold_timestep_rms" if args.length >= 2 =>
          // whole-timestep RMS cleanup. Target = the execute(input)
          // parameter → the WHOLE-SET final pass (ts_rms_final, the
          // published strategy's cleanup after the pol loop); any
          // other target → the per-pol pass after its detect loop.
          // Re-setting a slot to a DIFFERENT threshold displaces the
          // earlier call — reported, never silently dropped.
          resolve(args(1)) match {
            case Some(k) if k > 0 =>
              if (inputName.contains(args(0).trim)) {
                if (s.tsRmsFinal > 0 && s.tsRmsFinal != k)
                  tsFinalSnip.foreach(unmapped += _)
                s = s.copy(tsRmsFinal = k)
                tsFinalSnip = Some(snippet)
              } else {
                val here = inLoop(pos)
                // a re-targeting call displaces the earlier one when
                // the threshold OR the loop placement differs —
                // reported, never silently dropped; the LAST call
                // site's placement wins
                if (s.tsRmsThreshold > 0 &&
                    (s.tsRmsThreshold != k || s.tsRmsInLoop != here))
                  tsSnip.foreach(unmapped += _)
                // in-loop per-pol call site: MODELED — the engine
                // runs the pass inside every detect iteration, so
                // its flags feed the next iteration's statistics
                // (RfiStrategy.tsRmsInLoop), full fidelity
                s = s.copy(tsRmsThreshold = k, tsRmsInLoop = here)
                tsSnip = Some(snippet)
              }
              if (inLoop(pos) && inputName.contains(args(0).trim))
                approximated += s"$snippet: the whole-set final " +
                  "pass called inside a loop body; the engine runs " +
                  "ts_rms_final ONCE after the pol loop (it reads " +
                  "the combined grid, which does not exist inside " +
                  "the per-pol loop) — masks can diverge from " +
                  "AOFlagger"
            case _ => unmapped += snippet
          }
        case "threshold_channel_rms" if args.length >= 2 =>
          // whole-channel RMS cleanup (after SIR); arg 3 is AOFlagger's
          // flag_low_outliers — a literal true/false (absent → true,
          // the published MWA default call's value); an expression the
          // translator can't decide is reported, not guessed
          val low = args.lift(2).map(_.trim)
          (resolve(args(1)), low) match {
            case (Some(k), l) if k > 0 &&
                l.forall(a => a == "true" || a == "false") =>
              val here = inLoop(pos)
              val lowHere = l.forall(_ == "true")
              // a re-targeting call displaces the earlier one when
              // the threshold, the loop placement OR the flag_low arg
              // differs — any of the three changes the pass
              if (s.chRmsThreshold > 0 &&
                  (s.chRmsThreshold != k || s.chRmsInLoop != here ||
                    s.chRmsFlagLow != lowHere))
                chSnip.foreach(unmapped += _)
              // in-loop call site: MODELED — per-pol, inside every
              // detect iteration, before SIR (RfiStrategy.chRmsInLoop);
              // the LAST call site's placement wins
              s = s.copy(chRmsThreshold = k,
                chRmsFlagLow = lowHere,
                chRmsInLoop = here)
              chSnip = Some(snippet)
              if (!here && sirPos.exists(pos < _))
                approximated += s"$snippet: called BEFORE the " +
                  "strategy's scale_invariant_rank_operator; the " +
                  "engine runs the channel-RMS pass AFTER SIR — " +
                  "masks can diverge from AOFlagger"
            case _ => unmapped += snippet
          }
        case "apply_bandpass" if args.length >= 2 =>
          // external bandpass FILE: surfaced as a typed field for the
          // caller to route through PassbandGains.external (which
          // refuses to double-apply); a non-literal filename the
          // translator can't resolve is reported
          val a = args(1).trim
          if (a.length >= 2 &&
              ((a.head == '"' && a.last == '"') ||
                (a.head == '\'' && a.last == '\'')))
            bandpass += a.substring(1, a.length - 1)
          else unmapped += snippet
        case f if Scaffolding.contains(f) => ()
        case _ => unmapped += snippet
      }
      case Site(None, _, snippet, _) => unmapped += snippet
    }
    spillBracket() // anything still open at EOF is reported whole
    Translation(s, unmapped.toSeq.distinct, bandpass.toSeq,
      approximated.toSeq.distinct)
  }

  /** Load + translate from any Hadoop filesystem (same IO seam as
    * [[RfiStrategy.fromFile]]).
    */
  def fromFile(path: String,
               conf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration())
      : Translation = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      translate(bytes.toString("UTF-8"))
    } finally in.close()
  }
}
