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
  *  - `aoflagger.Polarization.XX|XY|YX|YY` mentions → `pols`
  *
  * Everything else a strategy can do (high/low-pass background
  * filtering, per-iteration threshold ramps, resizing, visualisation)
  * is NOT modeled; those calls are returned verbatim in
  * [[LuaStrategy.Translation.unmapped]] so the migration is honest —
  * the caller sees exactly which behaviors the translated strategy
  * drops, instead of a silent approximation.
  */
object LuaStrategy {

  /** The translated strategy plus every `aoflagger.*` call the engine
    * could not map — empty `unmapped` means full-fidelity migration.
    */
  case class Translation(strategy: RfiStrategy, unmapped: Seq[String])

  private val LocalNum =
    """local\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(-?[0-9.eE+-]+)\s*""".r
  private val Call =
    """aoflagger\.([a-z_]+)\s*\(([^)]*)\)""".r
  private val Pol = """aoflagger\.Polarization\.(XX|XY|YX|YY)""".r

  /** Calls that are part of every published strategy's scaffolding and
    * carry no detection knobs the engine lacks — not worth reporting.
    */
  private val Scaffolding = Set("set_progress", "set_flag_function",
    "copy_to_channel", "copy_from_channel", "norm", "print_polarization_statistics")

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

    val env: Map[String, Double] = LocalNum.findAllMatchIn(text)
      .flatMap { m =>
        try Some(m.group(1) -> m.group(2).toDouble)
        catch { case _: Exception => None }
      }.toMap

    def resolve(arg: String): Option[Double] = {
      val a = arg.trim
      try Some(a.toDouble)
      catch { case _: Exception => env.get(a) }
    }

    val pols = Pol.findAllMatchIn(text).map(_.group(1).toLowerCase)
      .toSeq.distinct

    var s = RfiStrategy(
      pols = if (pols.nonEmpty) pols else Seq("xx"),
      // absent calls leave AOFlagger features off, not at engine
      // defaults: a Lua file that never invokes SIR runs without it
      sirEtaTime = 0.0, sirEtaChan = 0.0)
    env.get("base_threshold").foreach(bt => s = s.copy(madK = 6.0 * bt))

    val unmapped = scala.collection.mutable.ArrayBuffer[String]()
    Call.findAllMatchIn(text).foreach { m =>
      val (fn, args) = (m.group(1), m.group(2).split(",").toSeq)
      fn match {
        case "sumthreshold" if args.length >= 3 =>
          for (lt <- resolve(args(1))) s = s.copy(timeWeight = 1.0 / lt)
          for (lf <- resolve(args(2))) s = s.copy(chanWeight = 1.0 / lf)
        case "scale_invariant_rank_operator" if args.length >= 3 =>
          for (h <- resolve(args(1))) s = s.copy(sirEtaTime = h)
          for (v <- resolve(args(2))) s = s.copy(sirEtaChan = v)
        case f if Scaffolding.contains(f) => ()
        case _ => unmapped += m.matched
      }
    }
    Translation(s, unmapped.toSeq.distinct)
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
